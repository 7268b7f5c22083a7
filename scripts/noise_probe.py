"""In-kernel noise probe, step 1: measure the replaceable XLA-side cost
(round-3 VERDICT item 6).

With in-kernel encode, the one remaining (B, N) materialization outside
the fused kernel is the embedded channel noise: XLA draws (B, n) normals,
scatters them into the (B, L, M) N-space buffer, and the kernel reads
that buffer back from HBM.  Synthesizing the noise inside the kernel
(pltpu PRNG + Box-Muller on the support mask) would remove the draw, the
scatter write, and the HBM read — at the price of ~L*M uniform draws +
transcendentals per codeword on the VPU.

This script bounds the prize before any kernel work: it times
  (a) the full headline block (in-kernel encode, shipped bench config);
  (b) the noise-gen + embed + full-tensor readback subgraph alone —
      an upper bound on what in-kernel noise could save.
Measurement discipline per docs/PERF.md: whole jitted blocks, distinct
key block per rep, forced scalar readback per rep, median of reps.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def main():
    from sparc_ldpc_tpu.config import SparcConfig
    from sparc_ldpc_tpu.models.sparc import SparcModel
    from sparc_ldpc_tpu.utils import rng as rngu

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    cfg = SparcConfig(L=1024, M=512, R=1.0, power_alloc="iterative",
                      op_kind="hadamard", amp_iters=32, amp_tol=0.0,
                      transform_precision="bf16", amp_kernel="fused_split",
                      amp_iters_auto=True)
    model = SparcModel.build(cfg, ebno_db=2.0)
    print(f"B={B} T={model.cfg.amp_iters} devices={jax.devices()}",
          flush=True)

    run_full = jax.jit(model.run_block)

    import math
    sigma = jnp.float32(math.sqrt(model.sigma2))

    def gen_embed(tkeys):
        nkeys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(tkeys)
        noise = jax.vmap(
            lambda k: jax.random.normal(k, (cfg.n,), dtype=jnp.float32)
        )(nkeys)
        y_n = model.op.embed_y(noise * sigma)
        # force the (B, N) buffer to exist and be read once (the fused
        # kernel reads it exactly once as its aliased y input)
        return jnp.sum(y_n), jnp.sum(jnp.abs(y_n))

    run_gen = jax.jit(gen_embed)

    def med(fn, read, reps=5, tag=""):
        t0 = time.perf_counter()
        read(fn(rngu.trial_keys(rngu.base_key(99), B)))
        print(f"{tag} compile+first: {time.perf_counter()-t0:.1f}s",
              flush=True)
        ts = []
        for r in range(1, reps + 1):
            keys = rngu.trial_keys(rngu.base_key(r), B)
            t0 = time.perf_counter()
            read(fn(keys))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2], ts

    dt_full, ts_f = med(run_full, lambda o: int(o["bit_errors"]),
                        tag="full block")
    dt_gen, ts_g = med(run_gen, lambda o: float(o[0]), tag="gen+embed")

    bits = B * cfg.k_bits
    print(f"full block: {dt_full*1e3:.1f} ms  "
          f"({bits/dt_full/1e6:.1f} Mbit/s)  all={['%.1f' % (t*1e3) for t in ts_f]}")
    print(f"gen+embed+read: {dt_gen*1e3:.1f} ms  "
          f"= {100*dt_gen/dt_full:.1f}% of block  "
          f"all={['%.1f' % (t*1e3) for t in ts_g]}")
    print(f"throughput ceiling if fully removed: "
          f"{bits/(dt_full-dt_gen)/1e6:.1f} Mbit/s")


if __name__ == "__main__":
    main()
