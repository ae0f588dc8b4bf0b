#!/bin/bash
# Continuous calm-window sampler for the scaling criterion (round-long).
#
# Criterion-weighted: two attempts at the criterion pair (N=4, 4N=16,
# wide level first so it gets the freshest calm) per cycle, the context
# pairs (6/24, 8/32) every third cycle so the saturation table stays
# honest, then a bench.py suite-wall sample for the current source
# digest. Min-merge histories (BENCH/scaling_attempts.jsonl,
# BENCH/bench_attempts.jsonl) turn any calm window the shared host
# gives us into the round's record.
#
# calm_wait: an attempt taken during a pytest-sized load storm is a
# guaranteed-discarded 8 minutes — wait (bounded) for 1-min loadavg to
# drop before spending the slot. Proceed anyway after the deadline so
# a long-busy box can't starve the sampler.
# Stop with: touch /tmp/stop_round_loop
cd /root/repo
calm_wait() {
  local deadline=$((SECONDS + $1))
  while [ $SECONDS -lt $deadline ]; do
    [ -f /tmp/stop_round_loop ] && return 0
    load=$(cut -d' ' -f1 /proc/loadavg)
    awk -v l="$load" 'BEGIN{exit !(l < 3.0)}' && return 0
    sleep 15
  done
  return 0
}
cycle=0
while [ ! -f /tmp/stop_round_loop ]; do
  calm_wait 300
  SCALING_ATTEMPTS=1 SCALING_LEVELS=16,16 python -u scripts/scaling_bench.py 2000000 >> /tmp/round_loop.log 2>&1
  [ -f /tmp/stop_round_loop ] && break
  calm_wait 180
  SCALING_ATTEMPTS=1 SCALING_LEVELS=16,4 python -u scripts/scaling_bench.py 2000000 >> /tmp/round_loop.log 2>&1
  [ -f /tmp/stop_round_loop ] && break
  if (( cycle % 3 == 0 )); then
    SCALING_ATTEMPTS=1 SCALING_LEVELS=24,32,6,8 python -u scripts/scaling_bench.py 2000000 >> /tmp/round_loop.log 2>&1
    [ -f /tmp/stop_round_loop ] && break
  fi
  if (( cycle % 3 == 1 )); then
    # 2x-input saturation pair (round-5 VERDICT #1): wide level first
    calm_wait 180
    SCALING_ATTEMPTS=1 SCALING_LEVELS=32,8 python -u scripts/scaling_bench.py 4000000 >> /tmp/round_loop.log 2>&1
    [ -f /tmp/stop_round_loop ] && break
  fi
  python -u bench.py >> /tmp/round_loop.log 2>&1
  cycle=$((cycle + 1))
done
echo "round loop stopped" >> /tmp/round_loop.log
