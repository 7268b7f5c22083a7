"""On-chip microbenchmark: FWHT variants + AMP decode at bench scale.

Usage: python scripts/tpu_transform_bench.py
Compares fwht_mxu precision modes and the fused Pallas kernel, then times
the full AMP block for the winning configs.  Informs the defaults used by
bench.py (results recorded in docs/PERF.md).
"""

import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

from sparc_ldpc_tpu.config import SparcConfig
from sparc_ldpc_tpu.models.sparc import SparcModel
from sparc_ldpc_tpu.ops.fwht import fwht_mxu, fwht_pallas
from sparc_ldpc_tpu.utils import rng as rngu
from sparc_ldpc_tpu.utils.profiling import timeit_blocked


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    B, N = 128, 1 << 19
    x = jax.random.normal(jax.random.key(0), (B, N), dtype=jnp.float32)

    variants = {
        "mxu_highest": jax.jit(lambda v: fwht_mxu(v, precision="highest")),
        "mxu_high": jax.jit(lambda v: fwht_mxu(v, precision="high")),
        "mxu_default": jax.jit(lambda v: fwht_mxu(v, precision="default")),
        "mxu_bf16": jax.jit(lambda v: fwht_mxu(v, precision="bf16")),
        "pallas": jax.jit(fwht_pallas),
    }
    ref = None
    for name, fn in variants.items():
        try:
            dt, out = timeit_blocked(fn, x, reps=10)
        except Exception as e:  # pallas may not be supported on axon yet
            print(f"{name:14s} FAILED: {type(e).__name__}: {str(e)[:200]}")
            continue
        gbps = (2 * 4 * B * N) / dt / 1e9
        if ref is None:
            ref = np.asarray(out[:1], dtype=np.float64)
            err = 0.0
        else:
            got = np.asarray(out[:1], dtype=np.float64)
            err = float(np.linalg.norm(got - ref) / np.linalg.norm(ref))
        print(f"{name:14s} {dt*1e3:7.2f} ms  {gbps:6.1f} GB/s eff  rel_err={err:.2e}")

    for prec in ("high", "bf16"):
        cfg = SparcConfig(L=1024, M=512, R=1.0, power_alloc="iterative",
                          op_kind="hadamard", amp_iters=32, amp_tol=0.0,
                          transform_precision=prec)
        model = SparcModel.build(cfg, ebno_db=2.0)
        run = jax.jit(model.run_block)
        tkeys = rngu.trial_keys(rngu.base_key(0), B)
        dt, out = timeit_blocked(run, tkeys, reps=3)
        print(f"amp_block[{prec:4s}] {dt*1e3:7.1f} ms  "
              f"{B*cfg.k_bits/dt/1e6:6.2f} Mbit/s  "
              f"sec_err={int(out['section_errors'])} "
              f"tau2={float(out['tau2_final']):.4f}")


if __name__ == "__main__":
    main()


def rev_variants():
    import jax, jax.numpy as jnp
    from sparc_ldpc_tpu.ops.fwht import fwht_to_rev, fwht_from_rev
    B, N = 128, 1 << 19
    x = jax.random.normal(jax.random.key(0), (B, N), dtype=jnp.float32)
    for name, fn in {
        "to_rev_high": jax.jit(lambda v: fwht_to_rev(v, precision="high")),
        "to_rev_default": jax.jit(lambda v: fwht_to_rev(v, precision="default")),
        "to_rev_bf16": jax.jit(lambda v: fwht_to_rev(v, precision="bf16")),
        "from_rev_bf16": jax.jit(lambda v: fwht_from_rev(v, precision="bf16")),
    }.items():
        dt, _ = timeit_blocked(fn, x, reps=10)
        print(f"{name:16s} {dt*1e3:7.2f} ms  {(2*4*B*N)/dt/1e9:6.1f} GB/s eff")
