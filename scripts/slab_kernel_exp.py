"""A/B the block-value dataflow ("slab") fused AMP kernel vs the staged
split kernel on the flagship config (docs/PERF.md measurement discipline:
whole jitted blocks, distinct keys per rep, scalar readback each rep).

Usage: python scripts/slab_kernel_exp.py [kernels...] [--L 1024] [--B 1024]
"""

import argparse
import sys
import time

import jax

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from sparc_ldpc_tpu.config import SparcConfig
from sparc_ldpc_tpu.models.sparc import SparcModel
from sparc_ldpc_tpu.utils import rng as rngu


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("kernels", nargs="*",
                    default=["fused_split", "fused_slab"])
    ap.add_argument("--L", type=int, default=1024)
    ap.add_argument("--M", type=int, default=512)
    ap.add_argument("--B", type=int, default=1024)
    ap.add_argument("--T", type=int, default=32)
    ap.add_argument("--ebno", type=float, default=2.0)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", file=sys.stderr)

    for kern in args.kernels:
        cfg = SparcConfig(L=args.L, M=args.M, R=1.0,
                          power_alloc="iterative", op_kind="hadamard",
                          amp_iters=args.T, amp_tol=0.0,
                          transform_precision="bf16", amp_kernel=kern)
        model = SparcModel.build(cfg, ebno_db=args.ebno)
        run = jax.jit(model.run_block)
        t0 = time.perf_counter()
        out = run(rngu.trial_keys(rngu.base_key(999), args.B))
        first = int(out["bit_errors"])
        compile_s = time.perf_counter() - t0
        times = []
        for r in range(args.reps):
            keys = rngu.trial_keys(rngu.base_key(r), args.B)
            t0 = time.perf_counter()
            out = run(keys)
            sec_err = int(out["section_errors"])
            times.append(time.perf_counter() - t0)
        times.sort()
        med = times[len(times) // 2]
        mbps = args.B * cfg.k_bits / med / 1e6
        us_it_cw = med * 1e6 / (args.T * args.B)
        print(f"{kern:12s}: {med*1e3:7.1f} ms/block  {mbps:6.2f} Mbit/s  "
              f"{us_it_cw:5.2f} us/iter/cw  sec_err={sec_err} "
              f"tau2={float(out['tau2_final']):.4f}  compile={compile_s:.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
