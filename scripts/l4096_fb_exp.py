"""f_b sweep for the split fused AMP kernel at L=4096 (judged config 3).

The L=4096 kernel runs at ~225 us/iter/cw against an MXU-bound ~30 us
(12% util, vs 81% at L=1024).  Hypothesis: the f_b=128 split makes the
L-stage 32 narrow slab matmuls + 5 unrolled butterfly stages over 32 tiles
(huge IR, poor scheduling).  Wider slabs (f_b=512 -> f_a=8: 8 slab matmuls
+ 3 butterfly stages) trade more MXU FLOPs (which are cheap) for less VPU
work and a smaller program.

Usage: python scripts/l4096_fb_exp.py [f_b ...]   (default 128 512 256)
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from sparc_ldpc_tpu.config import SparcConfig
from sparc_ldpc_tpu.models.sparc import SparcModel
from sparc_ldpc_tpu.ops.amp_kernel import amp_fused
from sparc_ldpc_tpu.utils import rng as rngu

B, T, EBNO = 8, 20, 8.0


def main():
    fbs = [int(a) for a in sys.argv[1:]] or [128, 512, 256]
    cfg = SparcConfig(L=4096, M=512, R=1.5, power_alloc="iterative",
                      op_kind="hadamard", amp_kernel="fused", amp_tol=0.0,
                      transform_precision="bf16")
    model = SparcModel.build(cfg, ebno_db=EBNO)
    op, L, M, n = model.op, cfg.L, cfg.M, cfg.n

    tkeys = rngu.trial_keys(rngu.base_key(7), B)
    mkeys = jax.vmap(lambda k: jax.random.fold_in(k, 0))(tkeys)
    nkeys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(tkeys)
    idx = jax.vmap(lambda k: jax.random.randint(k, (L,), 0, M))(mkeys)
    beta0 = model.build_beta(idx)
    x = op.Ax(beta0)
    sigma = jnp.sqrt(cfg.sigma2(EBNO))
    noise = jax.vmap(lambda k: jax.random.normal(k, (n,)))(nkeys)
    y = x + sigma * noise

    y_n = op.embed_y(y).reshape(B, L, M)
    mask2d = op.mask.reshape(L, M)
    sq = model.sq_npl

    for f_b in fbs:
        fn = jax.jit(lambda yn: amp_fused(
            yn, mask2d, sq, cfg.P, n, T, split=True, f_b=f_b))
        t0 = time.perf_counter()
        beta, tr = fn(y_n)
        beta.block_until_ready()
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            beta, tr = fn(y_n)
            beta.block_until_ready()
            times.append(time.perf_counter() - t0)
        ms = sorted(times)[len(times) // 2] * 1e3
        sec_err = int(jnp.sum(jnp.argmax(beta, axis=2) != idx))
        per = ms * 1e3 / (B * T)
        print(f"f_b={f_b:4d} (f_a={L//f_b:3d}): {ms:7.1f} ms/block  "
              f"{per:6.1f} us/iter/cw  sec_err={sec_err}/{B*L}  "
              f"tau2={float(tr[-1,0]):.4f}  compile={compile_s:.0f}s",
              flush=True)


if __name__ == "__main__":
    main()
