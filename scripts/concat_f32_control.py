"""f32-XLA control leg for the concat_small parity artifact.

The 3.0 dB mid-waterfall point shows a 12%-relative oracle(f64) vs
TPU(bf16 fused) BER gap at 0.93x the joint 95% bound — the same shape as
the plain_small 2.0 dB plateau, where an f32-XLA control established the
gap as PRECISION sensitivity (f32-XLA == bf16-fused != f64-oracle) and
justified the documented relative floor.  This runs the identical chain
on the XLA kernel route at transform_precision="highest" (f32
end-to-end, no bf16, no Pallas): if the control lands on the bf16 TPU
leg rather than the f64 oracle, the gap is precision sensitivity of the
waterfall operating point, not a kernel bug.

Appends kind="control_f32xla" records to the artifact jsonl.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dataclasses import replace

import jax

from ber_parity import CONCAT_PRESETS, GRIDS, append_record
from sparc_ldpc_tpu.models.concat import ConcatModel
from sparc_ldpc_tpu.utils import rng as rngu


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "concat_small"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 10240
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    cfg = CONCAT_PRESETS[preset]
    # engine="qc_xla": pin the XLA BP implementation — the control's
    # contract is "no Pallas anywhere", and since round 5 engine="qc"
    # layered auto-routes to the Pallas BP kernel on TPU backends
    cfg = replace(cfg, sparc=replace(
        cfg.sparc, amp_kernel="xla", amp_tol=0.0,
        transform_precision="highest"),
        ldpc=replace(cfg.ldpc, engine="qc_xla"))
    n_blocks = (trials + batch - 1) // batch
    for pi, ebno in enumerate(GRIDS[preset]):
        model = ConcatModel.build(cfg, ebno_db=ebno)
        run = model.run_block_staged
        t0 = time.time()
        _ = int(run(rngu.trial_keys(rngu.base_key(10**6), batch))
                ["bit_errors"])
        compile_s = time.time() - t0
        be = fe = bp = tr = 0
        be2 = 0.0
        t0 = time.time()
        for b in range(n_blocks):
            keys = rngu.trial_keys(
                rngu.block_key(rngu.point_key(rngu.base_key(0), pi), b),
                batch)
            out = run(keys)
            be += int(out["bit_errors"])
            be2 += float(out["bit_errors_sq"])
            fe += int(out["frame_errors"])
            bp += int(out["bp_ok"])
            tr += batch
        append_record(preset, dict(
            kind="control_f32xla", ebno_db=ebno, trials=tr, bit_errors=be,
            bit_errors_sq=be2, frame_errors=fe, bp_ok=bp,
            k_bits=model.k_user, L=cfg.sparc.L,
            ber=be / (tr * model.k_user), fer=fe / tr,
            wall_s=time.time() - t0, compile_s=compile_s,
            kernel="xla", precision="highest"))


if __name__ == "__main__":
    main()
