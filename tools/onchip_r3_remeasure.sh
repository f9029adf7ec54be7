#!/bin/bash
# On-chip re-measurement queued by the round-3 device-time correction
# (BENCHMARKS.md "Pure device compute"): true forward/train device times
# via in-jit chaining, then a bench sanity pass.  Run on the real TPU
# tunnel; every step is bounded.
set -x
cd "$(dirname "$0")/.."

# 1) true serving-forward device time, f32 vs bf16 (one program each;
#    remote compile is persistent-cached)
timeout 2400 env BENCH_DTYPES=f32 python3 tools/bench_device_time.py forward 256 20
timeout 2400 env BENCH_DTYPES=bf16 python3 tools/bench_device_time.py forward 256 20

# 2) true joint-train-step device time (fwd+bwd+opt), f32
timeout 3000 env BENCH_DTYPES=f32 python3 tools/bench_device_time.py train 4 10

# 3) bench sanity at small N (validates the official path + cache)
timeout 1800 env BENCH_CLIPS=512 BENCH_MAX_REPEATS=3 BENCH_TIME_BUDGET=60 \
    BENCH_WALL_BUDGET=240 BENCH_SECONDARY=0 python3 bench.py

# 4) if a FAST phase is showing (raw_link_mb_s > 200), A/B stream mode:
#    the corrected compute model predicts upload/compute overlap could
#    matter there (BENCHMARKS.md round-4 candidate)
# timeout 1800 env BENCH_MODE=stream BENCH_CLIPS=2048 python3 bench.py
