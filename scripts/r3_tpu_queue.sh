#!/bin/bash
# Round-3 serialized TPU job queue (one chip; jobs must not interleave).
# Each step appends to results/ artifacts; all are restartable.
set -x
cd /root/repo

echo "=== [1/6] bench sanity (cached compile) ==="
timeout 1800 python bench.py

echo "=== [2/6] concat_small TPU BER-parity leg ==="
timeout 3600 python scripts/ber_parity.py tpu --preset concat_small \
    --trials 10240 --batch 512

echo "=== [3/6] concat sweep (shipped preset, r3) ==="
timeout 5400 python -m sparc_ldpc_tpu.cli campaign --preset concat \
    --ebno 2.5 3.0 3.5 4.0 4.5 --batch 128 --min-frame-errors 100 \
    --max-trials 100000 --out results/concat_sweep_r3.jsonl

echo "=== [4/6] concat_wifi sweep ==="
timeout 5400 python -m sparc_ldpc_tpu.cli campaign --preset concat_wifi \
    --ebno 2.0 2.5 3.0 3.5 4.0 4.5 --batch 128 --min-frame-errors 100 \
    --max-trials 100000 --out results/concat_wifi_sweep.jsonl

echo "=== [5/6] fast_l4096 sweep (TPU+SE; oracle infeasible at L=4096) ==="
timeout 5400 python -m sparc_ldpc_tpu.cli campaign --preset fast_l4096 \
    --ebno 5.0 5.5 6.0 6.5 7.0 --batch 256 --min-frame-errors 100 \
    --max-trials 100000 --out results/fast_l4096_sweep.jsonl

echo "=== [6/6] headline profiler trace ==="
timeout 3600 python scripts/profile_headline.py --batch 2048 \
    --out results/trace_headline

echo "=== queue done ==="
