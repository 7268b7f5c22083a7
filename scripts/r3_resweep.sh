#!/bin/bash
# Round-3 artifact regeneration at the current commit (scale-free kernels):
# every judged-config sweep re-emitted so results/ carries no records from
# superseded kernel revisions.  Serialized (one chip).
set -x
cd /root/repo

rm -f results/fast_l4096_sweep.jsonl results/fast_l4096_sweep.jsonl.journal
timeout 5400 python -m sparc_ldpc_tpu.cli campaign --preset fast_l4096 \
    --ebno 5.0 5.5 6.0 6.5 7.0 --batch 256 --min-frame-errors 100 \
    --max-trials 100000 --out results/fast_l4096_sweep.jsonl
timeout 1800 python scripts/append_se_legs.py fast_l4096 \
    results/fast_l4096_sweep.jsonl 5.0 5.5 6.0 6.5 7.0

rm -f results/concat_sweep_r3.jsonl results/concat_sweep_r3.jsonl.journal
timeout 5400 python -m sparc_ldpc_tpu.cli campaign --preset concat \
    --ebno 2.5 3.0 3.5 4.0 4.5 --batch 512 --min-frame-errors 100 \
    --max-trials 100000 --out results/concat_sweep_r3.jsonl

rm -f results/concat_wifi_sweep.jsonl results/concat_wifi_sweep.jsonl.journal
timeout 5400 python -m sparc_ldpc_tpu.cli campaign --preset concat_wifi \
    --ebno 2.0 2.5 3.0 3.5 4.0 4.5 --batch 512 --min-frame-errors 100 \
    --max-trials 100000 --out results/concat_wifi_sweep.jsonl

rm -f results/pa_l1024_sweep_r3.jsonl results/pa_l1024_sweep_r3.jsonl.journal
timeout 5400 python -m sparc_ldpc_tpu.cli campaign --preset pa_l1024 \
    --fused --auto-iters --amp-iters 64 --ebno 1.5 1.75 2.0 2.25 2.5 2.75 3.0 \
    --batch 2048 --min-frame-errors 100 --max-trials 200000 \
    --out results/pa_l1024_sweep_r3.jsonl
timeout 1800 python scripts/append_se_legs.py pa_l1024 \
    results/pa_l1024_sweep_r3.jsonl 1.5 1.75 2.0 2.25 2.5 2.75 3.0

rm -f results/concat_r56_sweep.jsonl results/concat_r56_sweep.jsonl.journal
timeout 5400 python -m sparc_ldpc_tpu.cli campaign --preset concat_r56 \
    --ebno 2.5 3.0 3.5 4.0 4.5 5.0 --batch 512 --min-frame-errors 100 \
    --max-trials 100000 --out results/concat_r56_sweep.jsonl

timeout 600 python -m sparc_ldpc_tpu.cli plot results/fast_l4096_sweep.jsonl \
    --out results/fast_l4096_sweep.png
timeout 600 python -m sparc_ldpc_tpu.cli plot results/concat_sweep_r3.jsonl \
    results/concat_wifi_sweep.jsonl results/concat_r56_sweep.jsonl \
    --out results/concat_sweeps_r3.png
timeout 600 python -m sparc_ldpc_tpu.cli plot results/pa_l1024_sweep_r3.jsonl \
    --out results/pa_l1024_sweep_r3.png
echo "=== resweep done ==="
