"""L-axis transform stage experiments for the split fused AMP kernel.

Ablation (scripts/kernel_ablation.py) showed the L-stage costs ~8.7 us of
the 19 us iter/cw — far above its ~1.5 us FLOP bound — i.e. the slab
fori_loop + narrow f_a-contraction dominate.  Variants:

  slab_loop     H_1024 = H_8 (x) H_128, fori_loop slabs (current library)
  slab_unroll   same, Python-unrolled slabs
  slab_batched  H_128 stage as ONE batched dot_general (batch dim f_a)
  f512_vpu2     H_1024 = H_2 (x) H_512: one 512-contraction slab pair,
                H_2 stage as two full-tile VPU add/subs
  f256_vpu4     H_1024 = H_4 (x) H_256: 4 slabs, H_4 = 2 VPU butterfly stages

All variants decode for real (sec_err printed) so mis-implementations show.

Usage: python scripts/lstage_exp.py [variants...]
"""

import math
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from sparc_ldpc_tpu.config import SparcConfig
from sparc_ldpc_tpu.models.sparc import SparcModel
from sparc_ldpc_tpu.ops.fwht import hadamard_factor
from sparc_ldpc_tpu.utils import rng as rngu


def make_kernel(mode, T, n, P, inv_sqrt_n, f_a, f_b):
    def kernel(y_ref, mask_ref, hfa_ref, hfb_ref, hm_ref, sq_ref,
               beta_ref, trace_ref, z_scr, b_scr, w_scr):
        from jax.experimental import pallas as pl

        L, M = b_scr.shape
        mask = mask_ref[:].astype(jnp.float32)
        sq = sq_ref[:]

        def mm_t(a, b):           # a @ b with bf16 operands, f32 acc
            return jax.lax.dot_general(
                a.astype(jnp.bfloat16), b, (((a.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def lstage_matmul(w2):
            # outer H_{f_a} as a matmul (rows view (f_a, f_b*M))
            return jax.lax.dot_general(
                hfa_ref[:], w2.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def _fwht_blocks(bs):
            # Sylvester recursion on a list of equal-shape tiles:
            # H_{2k}[top; bot] = [H_k top + H_k bot; H_k top - H_k bot]
            if len(bs) == 1:
                return bs
            half = len(bs) // 2
            t = _fwht_blocks(bs[:half])
            u = _fwht_blocks(bs[half:])
            return ([ti + ui for ti, ui in zip(t, u)]
                    + [ti - ui for ti, ui in zip(t, u)])

        def lstage_vpu(w):
            # H_{f_a} over the f_a row blocks via VPU tile add/subs
            return _fwht_blocks([w[pl.ds(a * f_b, f_b), :]
                                 for a in range(f_a)])

        def fwht_tile(x):
            if mode == "l256_m128":
                t = jax.lax.dot_general(
                    x.reshape(L * 4, 128).astype(jnp.bfloat16), hm_ref[:],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).reshape(L, M)
                cols = _fwht_blocks([t[:, m1 * 128:(m1 + 1) * 128]
                                     for m1 in range(4)])
                t = jnp.concatenate(cols, axis=1)
                rows = [jax.lax.dot_general(
                            hfb_ref[:],
                            t[a * f_b:(a + 1) * f_b, :].astype(jnp.bfloat16),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        for a in range(f_a)]
                return jnp.concatenate(_fwht_blocks(rows), axis=0)
            w_scr[:] = mm_t(x, hm_ref[:])
            if mode == "slab_loop":
                def slab(a, _):
                    blk = w_scr[pl.ds(a * f_b, f_b), :]
                    w_scr[pl.ds(a * f_b, f_b), :] = jax.lax.dot_general(
                        hfb_ref[:], blk.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    return 0
                jax.lax.fori_loop(0, f_a, slab, 0)
                w2 = w_scr[:].reshape(f_a, f_b * M)
                return lstage_matmul(w2).reshape(L, M)
            if mode == "slab_unroll":
                for a in range(f_a):
                    blk = w_scr[pl.ds(a * f_b, f_b), :]
                    w_scr[pl.ds(a * f_b, f_b), :] = jax.lax.dot_general(
                        hfb_ref[:], blk.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                w2 = w_scr[:].reshape(f_a, f_b * M)
                return lstage_matmul(w2).reshape(L, M)
            if mode == "slab_batched":
                w3 = w_scr[:].reshape(f_a, f_b, M)
                hb = jnp.broadcast_to(hfb_ref[:], (f_a, f_b, f_b))
                w3 = jax.lax.dot_general(
                    hb, w3.astype(jnp.bfloat16),
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                w2 = w3.reshape(f_a, f_b * M)
                return lstage_matmul(w2).reshape(L, M)
            if mode in ("f512_vpu2", "f256_vpu4", "f128_vpu8"):
                for a in range(f_a):
                    blk = w_scr[pl.ds(a * f_b, f_b), :]
                    w_scr[pl.ds(a * f_b, f_b), :] = jax.lax.dot_general(
                        hfb_ref[:], blk.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                blocks = lstage_vpu(w_scr)
                out = jnp.concatenate(blocks, axis=0)
                return out
            raise ValueError(mode)

        b_scr[:] = jnp.zeros((L, M), jnp.float32)
        z_scr[:] = jnp.zeros((L, M), jnp.float32)
        trace_ref[0] = jnp.zeros(trace_ref.shape[1:], jnp.float32)

        def body(t, tau2_prev):
            beta = b_scr[:]
            bnorm2 = jnp.sum(beta * beta)
            coef = jnp.where(t == 0, 0.0, (P - bnorm2 / n) / tau2_prev)
            w = fwht_tile(beta)
            z = mask * (y_ref[0] - w * inv_sqrt_n) + coef * z_scr[:]
            z_scr[:] = z
            tau2 = jnp.sum(z * z) / n
            s = fwht_tile(z) * inv_sqrt_n + b_scr[:]
            a = (sq / tau2) * s
            a = a - jnp.max(a, axis=1, keepdims=True)
            e = jnp.exp(a)
            b_scr[:] = (sq / jnp.sum(e, axis=1, keepdims=True)) * e
            r_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            c_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            hit = (r_ids * 128 + c_ids) == t
            trace_ref[0] = jnp.where(hit, tau2, trace_ref[0])
            return tau2

        jax.lax.fori_loop(0, T, body, jnp.float32(jnp.inf))
        beta_ref[0] = b_scr[:]
    return kernel


def run_variant(mode, y_n, mask, sq_npl, P, n, T):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, M = y_n.shape
    f_b = {"f512_vpu2": 512, "f256_vpu4": 256,
           "l256_m128": 256}.get(mode, 128)
    f_a = L // f_b
    hfa = hadamard_factor(f_a, jnp.bfloat16)
    hfb = hadamard_factor(f_b, jnp.bfloat16)
    hm = hadamard_factor(128 if mode == "l256_m128" else M, jnp.bfloat16)
    kernel = make_kernel(mode, T, n, float(P), 1.0 / math.sqrt(n), f_a, f_b)
    beta, trace = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((B, L, M), jnp.float32),
                   jax.ShapeDtypeStruct((B, 8, 128), jnp.float32)),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, M), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, M), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f_a, f_a), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_b, f_b), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(hm.shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, L, M), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((L, M), jnp.float32),
            pltpu.VMEM((L, M), jnp.float32),
            pltpu.VMEM((L, M), jnp.float32),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(y_n, mask.astype(jnp.bfloat16), hfa, hfb, hm, sq_npl.reshape(L, 1))
    return beta, trace


def main():
    B, T = 512, 32
    cfg = SparcConfig(L=1024, M=512, R=1.0, power_alloc="iterative",
                      op_kind="hadamard", amp_iters=T, amp_tol=0.0,
                      transform_precision="bf16")
    model = SparcModel.build(cfg, ebno_db=2.0)
    op, sq = model.op, model.sq_npl
    from sparc_ldpc_tpu.utils.bits import bits_to_indices

    def make_block(mode):
        def block(keys):
            bits = jax.vmap(lambda k: jax.random.bernoulli(
                jax.random.fold_in(k, 0), 0.5,
                (cfg.k_bits,)))(keys).astype(jnp.int32)
            x = model.encode(bits)
            noise = jax.vmap(lambda k: jax.random.normal(
                jax.random.fold_in(k, 1), (cfg.n,)))(keys)
            y = x + noise * jnp.sqrt(model.sigma2)
            y_n = op.embed_y(y).reshape(B, cfg.L, cfg.M)
            beta, trace = run_variant(mode, y_n,
                                      op.mask.reshape(cfg.L, cfg.M),
                                      sq, cfg.P, cfg.n, T)
            idx_hat = jnp.argmax(beta, axis=-1)
            idx_true = bits_to_indices(bits, cfg.logM)
            return jnp.sum(idx_hat != idx_true)
        return jax.jit(block)

    variants = sys.argv[1:] or ["slab_loop", "slab_unroll", "slab_batched",
                                "f512_vpu2", "f256_vpu4"]
    for mode in variants:
        try:
            run = make_block(mode)
            se0 = int(run(rngu.trial_keys(rngu.base_key(999), B)))
            times = []
            for r in range(5):
                keys = rngu.trial_keys(rngu.base_key(r), B)
                t0 = time.perf_counter()
                se = int(run(keys))
                times.append(time.perf_counter() - t0)
            times.sort()
            med = times[len(times) // 2]
            print(f"{mode:13s}: {med*1e3:7.1f} ms/block "
                  f"{B*cfg.k_bits/med/1e6:6.2f} Mbit/s  "
                  f"({med/B/T*1e6:5.2f} us/iter/cw)  sec_err={se}",
                  flush=True)
        except Exception as e:
            print(f"{mode:13s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
