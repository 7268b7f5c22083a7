#!/bin/bash
# Round-5 sweep regeneration: the fused presets ship amp_noise_in_kernel
# =True since round 5 (stream oracle-anchored by the noisek parity legs),
# ride the pipelined campaign dispatch, and the layered QC BP auto-routes
# to the Pallas kernel (bitwise-equal, scripts/bp_pallas_ab.py) — so
# their sweep artifacts re-emit under the new provenance hashes as *_r5
# files.  The old files stay on disk as STALE-listed history
# (results/STALE.md).  pa_l1024 ships the XLA route unchanged; its r3
# sweep still describes it.  Serialized (one chip).
set -x
cd /root/repo

rm -f results/fast_l4096_sweep_r5.jsonl results/fast_l4096_sweep_r5.jsonl.journal
timeout 5400 python -m sparc_ldpc_tpu.cli campaign --preset fast_l4096 \
    --ebno 5.0 5.5 6.0 6.5 7.0 --batch 256 --min-frame-errors 100 \
    --max-trials 100000 --out results/fast_l4096_sweep_r5.jsonl
timeout 1800 python scripts/append_se_legs.py fast_l4096 \
    results/fast_l4096_sweep_r5.jsonl 5.0 5.5 6.0 6.5 7.0

rm -f results/concat_sweep_r5.jsonl results/concat_sweep_r5.jsonl.journal
timeout 5400 python -m sparc_ldpc_tpu.cli campaign --preset concat \
    --ebno 2.5 3.0 3.5 4.0 4.5 --batch 512 --min-frame-errors 100 \
    --max-trials 100000 --out results/concat_sweep_r5.jsonl

rm -f results/concat_wifi_sweep_r5.jsonl results/concat_wifi_sweep_r5.jsonl.journal
timeout 5400 python -m sparc_ldpc_tpu.cli campaign --preset concat_wifi \
    --ebno 2.0 2.5 3.0 3.5 4.0 4.5 --batch 512 --min-frame-errors 100 \
    --max-trials 100000 --out results/concat_wifi_sweep_r5.jsonl

rm -f results/concat_r56_sweep_r5.jsonl results/concat_r56_sweep_r5.jsonl.journal
timeout 5400 python -m sparc_ldpc_tpu.cli campaign --preset concat_r56 \
    --ebno 2.5 3.0 3.5 4.0 4.5 5.0 --batch 512 --min-frame-errors 100 \
    --max-trials 100000 --out results/concat_r56_sweep_r5.jsonl

timeout 600 python -m sparc_ldpc_tpu.cli plot results/fast_l4096_sweep_r5.jsonl \
    --out results/fast_l4096_sweep.png
timeout 600 python -m sparc_ldpc_tpu.cli plot results/concat_sweep_r5.jsonl \
    results/concat_wifi_sweep_r5.jsonl results/concat_r56_sweep_r5.jsonl \
    --out results/concat_sweeps_r5.png
echo "=== r5 resweep done ==="
