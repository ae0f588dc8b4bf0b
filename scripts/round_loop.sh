#!/bin/bash
# Continuous calm-window sampler for the scaling criterion (round-long).
#
# Each cycle: one attempt at the criterion pair (N=4, 4N=16, wide level
# first), one attempt across the context pairs (6/24, 8/32) so the
# saturation table stays honest, then a bench.py suite-wall sample for
# the current source digest. Min-merge histories
# (BENCH/scaling_attempts.jsonl, BENCH/bench_attempts.jsonl) turn any
# calm window the shared host gives us into the round's record.
# Stop with: touch /tmp/stop_round_loop
cd /root/repo
while [ ! -f /tmp/stop_round_loop ]; do
  SCALING_ATTEMPTS=1 SCALING_LEVELS=16,4 python -u scripts/scaling_bench.py 2000000 >> /tmp/round_loop.log 2>&1
  [ -f /tmp/stop_round_loop ] && break
  SCALING_ATTEMPTS=1 SCALING_LEVELS=24,32,6,8 python -u scripts/scaling_bench.py 2000000 >> /tmp/round_loop.log 2>&1
  [ -f /tmp/stop_round_loop ] && break
  python -u bench.py >> /tmp/round_loop.log 2>&1
done
echo "round loop stopped" >> /tmp/round_loop.log
