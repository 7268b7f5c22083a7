"""Judged-config artifact checks (round-2 VERDICT missing #2 / weak #4).

Every sweep artifact under results/ that claims to describe a shipped
preset must (a) exist for the judged configs, (b) carry provenance
(preset + config_hash) matching the CURRENT preset, and (c) satisfy basic
statistical discipline (min frame errors per point where the budget is
reachable).  Tests skip point-first while an artifact is still being
built, exactly like tests/test_ber_parity.py.
"""

import json
import os

import pytest

from sparc_ldpc_tpu.config import PRESETS
from sparc_ldpc_tpu.utils.provenance import config_hashes

RESULTS = os.path.join(os.path.dirname(__file__), "..", "results")

# artifact file -> (preset name, min points, min frame errors per point)
# (the fused presets ship amp_noise_in_kernel=True since round 5, so
# their sweeps regenerated as *_r5; pa_l1024 ships the XLA route and its
# r3 sweep still describes it)
SWEEPS = {
    "concat_sweep_r5.jsonl": ("concat", 5, 100),
    "concat_wifi_sweep_r5.jsonl": ("concat_wifi", 5, 100),
    "fast_l4096_sweep_r5.jsonl": ("fast_l4096", 5, 100),
    "pa_l1024_sweep_r3.jsonl": ("pa_l1024", 7, 100),
    "concat_r56_sweep_r5.jsonl": ("concat_r56", 5, 100),
}


def _points(fname):
    path = os.path.join(RESULTS, fname)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()
                if json.loads(line).get("kind") == "point"]


def _accepted_hashes(preset):
    """The shipped preset hash, plus its CLI --fused/--auto-iters/
    --amp-iters 64 variants (cli.cmd_campaign applies exactly these
    replaces).  --fused changes only the kernel route (counters are
    route-parity-tested; it also pins amp_tol=0, i.e. fixed-T — the CLI
    prints that).  --auto-iters/--amp-iters DO change the iteration
    budget: raising the cap to 64 lets SE spend ~50 iterations at
    mid-waterfall points where the shipped cap of 32 under-iterates, so
    such artifacts are deliberate, documented cap-override variants of
    the preset (each sweep's kind="note" record states the budget), not
    bit-identical reproductions of it (ADVICE r3)."""
    from sparc_ldpc_tpu.config import ConcatConfig

    cfg = PRESETS[preset]
    out = [cfg]
    if isinstance(cfg, ConcatConfig):
        fused = cfg.replace(sparc=cfg.sparc.replace(
            amp_kernel="fused_split", amp_tol=0.0,
            transform_precision="bf16"))
        out += [fused,
                fused.replace(sparc=fused.sparc.replace(
                    amp_iters_auto=True))]
    else:
        fused = cfg.replace(amp_kernel="fused_split", amp_tol=0.0,
                            transform_precision="bf16")
        auto = fused.replace(amp_iters_auto=True)
        # --amp-iters 64: the documented cap for mid-waterfall points
        # where SE needs >32 iterations (pa_l1024 @ 2.5 dB: se_iters=50)
        out += [fused, auto, auto.replace(amp_iters=64)]
    # config_hashes also admits legacy fingerprints that predate
    # default-preserving fields (utils/provenance._DEFAULT_PRESERVING):
    # an artifact generated before amp_noise_in_kernel existed still
    # describes the preset, whose default (off) is the old behavior.
    return set().union(*(config_hashes(c) for c in out))


@pytest.mark.parametrize("fname", sorted(SWEEPS))
def test_sweep_artifact_current_and_disciplined(fname):
    preset, min_points, min_fe = SWEEPS[fname]
    pts = _points(fname)
    if pts is None:
        pytest.skip(f"artifact {fname} not built yet")
    assert len(pts) >= min_points, (fname, len(pts))
    want = _accepted_hashes(preset)
    for r in pts:
        # provenance: the artifact must describe the SHIPPED preset
        assert r.get("preset") == preset, r
        assert r.get("config_hash") in want, (
            f"{fname}: stale artifact (config_hash {r.get('config_hash')} "
            f"not in current {want}) — regenerate with the shipped preset")
        # statistical discipline: error budget met unless the trial cap
        # bound it (thin high-SNR tails are allowed to cap out)
        assert (r["frame_errors"] >= min_fe
                or r["trials"] >= 0.99 * 100_000), r
        # metric truthfulness: throughput is null or compile-free
        assert r.get("bits_per_s") is None or r.get("blocks", 0) >= 2, r


def test_stale_artifacts_are_marked():
    """The round-1/2 artifacts that predate provenance stamping must not
    masquerade as current: they either carry a config_hash (then it must
    match) or are listed in results/STALE.md as superseded."""
    stale_md = os.path.join(RESULTS, "STALE.md")
    legacy = ["concat_sweep.jsonl", "pa_l1024_sweep.jsonl",
              "pa_l1024_sweep_fused.jsonl",
              # round-3/4 sweeps of the fused presets, superseded by the
              # round-5 regenerations on the shipped in-kernel noise
              # stream (see results/STALE.md)
              "concat_sweep_r3.jsonl", "concat_wifi_sweep.jsonl",
              "concat_r56_sweep.jsonl", "fast_l4096_sweep.jsonl"]
    present = [f for f in legacy
               if os.path.exists(os.path.join(RESULTS, f))]
    if not present:
        return
    assert os.path.exists(stale_md), (
        "legacy artifacts present but results/STALE.md missing")
    listed = open(stale_md).read()
    for f in present:
        assert f in listed, f"{f} not marked stale in results/STALE.md"
