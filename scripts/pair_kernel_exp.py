"""EXPERIMENT: 2 codewords per Pallas program, stage-interleaved, to overlap
MXU (transform matmuls of codeword B) with VPU (softmax of codeword A).

The split fused kernel is VPU-bound at L=1024 (docs/PERF.md): matmuls ~7 us
of ~19 us per iter/codeword.  If Mosaic schedules the two independent
codewords' stages concurrently, the ceiling is max(MXU, VPU) instead of
their sum.  Measured before integrating into ops/amp_kernel.py.

Usage: python scripts/pair_kernel_exp.py
"""

import functools
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


def _amp_kernel_split_pair(T, n, P, inv_sqrt_n, f_a, f_b,
                           y_ref, mask_ref, hfa_ref, hfb_ref, hm_ref, sq_ref,
                           beta_ref, trace_ref,
                           z_scr, b_scr, w_scr):
    from jax.experimental import pallas as pl

    C = b_scr.shape[0]          # codewords per program (2)
    L, M = b_scr.shape[1:]
    mask = mask_ref[:].astype(jnp.float32)
    sq = sq_ref[:]

    def fwht_tile(c, x):
        w_scr[c] = jax.lax.dot_general(
            x.astype(jnp.bfloat16), hm_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        def slab(a, _):
            blk = w_scr[c, pl.ds(a * f_b, f_b), :]
            w_scr[c, pl.ds(a * f_b, f_b), :] = jax.lax.dot_general(
                hfb_ref[:], blk.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return 0
        jax.lax.fori_loop(0, f_a, slab, 0)
        w2 = w_scr[c].reshape(f_a, f_b * M)
        w2 = jax.lax.dot_general(
            hfa_ref[:], w2.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return w2.reshape(L, M)

    for c in range(C):
        b_scr[c] = jnp.zeros((L, M), jnp.float32)
        z_scr[c] = jnp.zeros((L, M), jnp.float32)
    trace_ref[0] = jnp.zeros(trace_ref.shape[1:], jnp.float32)

    def body(t, tau2_prev):
        # stage 1: forward transforms (both codewords -> MXU back to back)
        w = [fwht_tile(c, b_scr[c]) for c in range(C)]
        # stage 2: residual + tau (VPU) — can overlap c=1's matmuls
        tau2 = []
        for c in range(C):
            beta = b_scr[c]
            bnorm2 = jnp.sum(beta * beta)
            coef = jnp.where(t == 0, 0.0, (P - bnorm2 / n) / tau2_prev[c])
            z = mask * (y_ref[c] - w[c] * inv_sqrt_n) + coef * z_scr[c]
            z_scr[c] = z
            tau2.append(jnp.sum(z * z) / n)
        # stage 3: adjoint transforms
        s = [fwht_tile(c, z_scr[c]) for c in range(C)]
        # stage 4: denoise
        for c in range(C):
            a = (sq / tau2[c]) * (s[c] * inv_sqrt_n + b_scr[c])
            a = a - jnp.max(a, axis=1, keepdims=True)
            e = jnp.exp(a)
            b_scr[c] = (sq / jnp.sum(e, axis=1, keepdims=True)) * e
        r_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        c_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        hit = (r_ids * 128 + c_ids) == t
        trace_ref[0] = jnp.where(hit, tau2[0], trace_ref[0])
        return tuple(tau2)

    jax.lax.fori_loop(0, T, body, tuple(jnp.float32(jnp.inf) for _ in range(C)))
    for c in range(C):
        beta_ref[c] = b_scr[c]


def run_pair(y_n, mask, sq_npl, P, n, T):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, M = y_n.shape
    C = 2
    assert B % C == 0
    f_b = 128
    f_a = L // f_b
    hfa = hadamard_factor(f_a, jnp.bfloat16)
    hfb = hadamard_factor(f_b, jnp.bfloat16)
    hm = hadamard_factor(M, jnp.bfloat16)
    kernel = functools.partial(_amp_kernel_split_pair, T, n, float(P),
                               1.0 / math.sqrt(n), f_a, f_b)
    beta, trace = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((B, L, M), jnp.float32),
                   jax.ShapeDtypeStruct((B // C, 8, 128), jnp.float32)),
        grid=(B // C,),
        in_specs=[
            pl.BlockSpec((C, L, M), lambda b: (b, 0, 0),
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
            pl.BlockSpec((C, L, M), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((C, L, M), jnp.float32),
            pltpu.VMEM((C, L, M), jnp.float32),
            pltpu.VMEM((C, L, M), jnp.float32),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(y_n, mask.astype(jnp.bfloat16), hfa, hfb, hm,
      sq_npl.reshape(L, 1))
    return beta, trace


def main():
    B, T = 512, 32
    cfg = SparcConfig(L=1024, M=512, R=1.0, power_alloc="iterative",
                      op_kind="hadamard", amp_iters=T, amp_tol=0.0,
                      transform_precision="bf16")
    model = SparcModel.build(cfg, ebno_db=2.0)
    op, sq = model.op, model.sq_npl

    def block(keys):
        bits = jax.vmap(lambda k: jax.random.bernoulli(
            jax.random.fold_in(k, 0), 0.5, (cfg.k_bits,)))(keys).astype(jnp.int32)
        x = model.encode(bits)
        noise = jax.vmap(lambda k: jax.random.normal(
            jax.random.fold_in(k, 1), (cfg.n,)))(keys)
        y = x + noise * jnp.sqrt(model.sigma2)
        y_n = op.embed_y(y).reshape(B, cfg.L, cfg.M)
        beta, trace = run_pair(y_n, op.mask.reshape(cfg.L, cfg.M), sq,
                               cfg.P, cfg.n, T)
        idx_hat = jnp.argmax(beta, axis=-1)
        from sparc_ldpc_tpu.utils.bits import bits_to_indices
        idx_true = bits_to_indices(bits, cfg.logM)
        return {"section_errors": jnp.sum(idx_hat != idx_true),
                "tau2_final": trace.reshape(B // 2, 8 * 128)[:, T - 1].mean()}

    run = jax.jit(block)
    keys = rngu.trial_keys(rngu.base_key(999), B)
    out = run(keys)
    print("first:", int(out["section_errors"]), float(out["tau2_final"]),
          file=sys.stderr)
    times = []
    for r in range(5):
        keys = rngu.trial_keys(rngu.base_key(r), B)
        t0 = time.perf_counter()
        out = run(keys)
        se = int(out["section_errors"])
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    print(f"pair kernel: {med*1e3:7.1f} ms/block  "
          f"{B*cfg.k_bits/med/1e6:6.2f} Mbit/s  sec_err={se} "
          f"tau2={float(out['tau2_final']):.4f}")


if __name__ == "__main__":
    main()
