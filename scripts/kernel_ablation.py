"""Ablation timing of the split fused AMP kernel: where do the ~19 us per
iteration/codeword go?  Variants replace one stage with a near-free stand-in
(decode quality is garbage for ablated variants — timing only).

Usage: python scripts/kernel_ablation.py
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

        def fwht_tile(x):
            if mode == "no_transform":
                return x
            w_scr[:] = jax.lax.dot_general(
                x.astype(jnp.bfloat16), hm_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if mode != "m_stage_only":
                def slab(a, _):
                    blk = w_scr[pl.ds(a * f_b, f_b), :]
                    w_scr[pl.ds(a * f_b, f_b), :] = jax.lax.dot_general(
                        hfb_ref[:], blk.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    return 0
                jax.lax.fori_loop(0, f_a, slab, 0)
                w2 = w_scr[:].reshape(f_a, f_b * M)
                w2 = jax.lax.dot_general(
                    hfa_ref[:], w2.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return w2.reshape(L, M)
            return w_scr[:]

        b_scr[:] = jnp.zeros((L, M), jnp.float32)
        z_scr[:] = jnp.zeros((L, M), jnp.float32)
        trace_ref[0] = jnp.zeros(trace_ref.shape[1:], jnp.float32)

        def body(t, tau2_prev):
            beta = b_scr[:]
            if mode == "no_norms":
                coef = jnp.float32(0.1)
            else:
                bnorm2 = jnp.sum(beta * beta)
                coef = jnp.where(t == 0, 0.0,
                                 (P - bnorm2 / n) / tau2_prev)
            w = fwht_tile(beta)
            z = mask * (y_ref[0] - w * inv_sqrt_n) + coef * z_scr[:]
            z_scr[:] = z
            if mode == "no_norms":
                tau2 = jnp.float32(0.5)
            else:
                tau2 = jnp.sum(z * z) / n
            s = fwht_tile(z) * inv_sqrt_n + b_scr[:]
            if mode == "no_softmax":
                b_scr[:] = s * (sq / tau2) * 1e-3
            else:
                a = (sq / tau2) * s
                if mode != "no_max":
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
    f_b = 128
    f_a = L // f_b
    hfa = hadamard_factor(f_a, jnp.bfloat16)
    hfb = hadamard_factor(f_b, jnp.bfloat16)
    hm = hadamard_factor(M, jnp.bfloat16)
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
            pl.BlockSpec((M, M), lambda b: (0, 0), memory_space=pltpu.VMEM),
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
            return jnp.sum(beta[:, 0, :] != 0)     # cheap readback anchor
        return jax.jit(block)

    for mode in ("full", "no_softmax", "no_max", "no_transform",
                 "m_stage_only", "no_norms"):
        run = make_block(mode)
        _ = int(run(rngu.trial_keys(rngu.base_key(999), B)))
        times = []
        for r in range(5):
            keys = rngu.trial_keys(rngu.base_key(r), B)
            t0 = time.perf_counter()
            _ = int(run(keys))
            times.append(time.perf_counter() - t0)
        times.sort()
        med = times[len(times) // 2]
        print(f"{mode:14s}: {med*1e3:7.1f} ms/block "
              f"({med/B/T*1e6:5.2f} us/iter/cw)", flush=True)


if __name__ == "__main__":
    main()
