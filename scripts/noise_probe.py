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

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def run_ab(B: int = 2048, blocks: int = 10, ebno: float = 2.0):
    """Step 2: A/B the productized kernel path (amp_noise_in_kernel) at
    the headline config — median block wall both routes, plus BER over
    `blocks` x B trials with frame-clustered 95% CIs (the two routes draw
    DIFFERENT noise streams, so decisions compare statistically)."""
    import math

    from sparc_ldpc_tpu.config import SparcConfig
    from sparc_ldpc_tpu.models.sparc import SparcModel
    from sparc_ldpc_tpu.utils import rng as rngu

    stats = {}
    for flag in (False, True):
        cfg = SparcConfig(L=1024, M=512, R=1.0, power_alloc="iterative",
                          op_kind="hadamard", amp_iters=32, amp_tol=0.0,
                          transform_precision="bf16",
                          amp_kernel="fused_split", amp_iters_auto=True,
                          amp_noise_in_kernel=flag)
        model = SparcModel.build(cfg, ebno_db=ebno)
        print(f"flag={flag} ebno={ebno} T={model.cfg.amp_iters}",
              flush=True)
        run = jax.jit(model.run_block)
        t0 = time.perf_counter()
        _ = int(run(rngu.trial_keys(rngu.base_key(999), B))["bit_errors"])
        print(f"flag={flag}: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        be = fe = tr = 0
        be2 = 0.0
        ts = []
        for r in range(1, blocks + 1):
            keys = rngu.trial_keys(rngu.base_key(r), B)
            t0 = time.perf_counter()
            out = run(keys)
            be_r = int(out["bit_errors"])
            ts.append(time.perf_counter() - t0)
            be += be_r
            be2 += float(out["bit_errors_sq"])
            fe += int(out["frame_errors"])
            tr += B
        ts.sort()
        dt = ts[len(ts) // 2]
        k = cfg.k_bits
        ber = be / (tr * k)
        mean_be = be / tr
        var_be = max(be2 / tr - mean_be ** 2, 0.0)
        ci = 1.96 * math.sqrt(var_be / tr) / k
        stats[flag] = (dt, ber, ci, fe / tr)
        print(f"flag={flag}: {dt*1e3:.1f} ms/block "
              f"({B*k/dt/1e6:.1f} Mbit/s)  BER {ber:.5e} +- {ci:.2e} "
              f"FER {fe/tr:.4f}  ({tr} trials)", flush=True)
    (dt0, ber0, ci0, fer0), (dt1, ber1, ci1, fer1) = stats[False], stats[True]
    gap = abs(ber0 - ber1)
    bound = math.hypot(ci0, ci1)
    print(f"speedup: {dt0/dt1:.3f}x  BER |gap| {gap:.2e} vs joint95 "
          f"{bound:.2e} -> {'OK' if gap <= bound else 'APART'}", flush=True)


def main():
    from sparc_ldpc_tpu.config import SparcConfig
    from sparc_ldpc_tpu.models.sparc import SparcModel
    from sparc_ldpc_tpu.utils import rng as rngu

    if "--ab" in sys.argv:
        i = sys.argv.index("--ab")
        ebno = float(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 2.0
        run_ab(ebno=ebno)
        return

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
