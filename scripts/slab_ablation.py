"""Ablation of the wide-slab fused AMP kernel: standalone copy with stages
replaceable by near-free stand-ins (decode garbage for ablated variants —
timing only).  Variants:

  full        — the real kernel
  no_radix    — value-form butterfly stages replaced by identity
  no_mm       — all matmuls replaced by a cheap cast-copy (keeps casts)
  no_softmax  — exp/max/sum softmax replaced by a linear rescale
  no_consume  — z-update + softmax both trivial (transforms only)
  bf16_radix  — butterfly adds done in bf16 (packed VPU experiment)
  fold_hfb    — inv_sqrt_n folded into the hfb factor constant, so both
                per-transform scale multiplies vanish (round-2 VERDICT
                weak #1 lever b; timing-only — bf16(c*+-1) rounds ~0.2%)
  no_trace    — per-iteration (8,128) tau2-trace RMW elided (lever c)
  exp2        — softmax exp as exp2(x*log2 e) (fused multiply; tests
                whether the HW exp2 path beats the exp lowering)
  compact     — round-2 VERDICT weak #1 lever (a): the row subset laid out
                CONTIGUOUSLY in N-space (first n/M rows of the (L, M) slab)
                instead of scattered.  Off the support z is identically 0
                for all t, so the kernel (i) produces only the support row
                slab in the forward row stage (block combine + ONE matmul,
                since H_fa[0, :] = +1), (ii) runs z-update/tau^2 on one
                slab, (iii) feeds the adjoint a one-slab input whose col
                stage is 1/f_a the FLOPs and whose row stage collapses to
                one matmul broadcast to every slab (H_fa[:, 0] = +1).
                Timing-only here (fabricated compact mask); statistically
                the layout needs a random sign diagonal — see PERF.md.
  compact32   — same with the consumer sub-slab narrowed to the 32 rows
                (>= 18 = n/M) that actually hold support.

Usage: python scripts/slab_ablation.py [variants...]
"""

import functools
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from sparc_ldpc_tpu.config import SparcConfig
from sparc_ldpc_tpu.models.sparc import SparcModel
from sparc_ldpc_tpu.ops.fwht import hadamard_factor
from sparc_ldpc_tpu.ops.amp_kernel import _fwht_blocks, _mm, _mml
from sparc_ldpc_tpu.utils import rng as rngu


def make_compact_kernel(T, n, P, inv_sqrt_n, f_a, f_b, m_a, m_b, csub):
    """Lever (a): contiguous row support occupying rows [0, csub) of the
    (L, M) N-space slab (csub >= n/M).  See module docstring."""
    def kern(y_ref, mask_ref, hfb_ref, hmb_ref, sq_ref,
             beta_ref, trace_ref, z_scr, b_scr):
        from jax.experimental import pallas as pl

        L, M = b_scr.shape

        def rs(a):
            return pl.ds(a * f_b, f_b)

        def cs(j):
            return pl.ds(j * m_b, m_b)

        def col_stage(read_tall):
            tall = [_mm(read_tall(j), hmb_ref[:]) for j in range(m_a)]
            return _fwht_blocks(tall) if m_a > 1 else tall

        b_scr[:] = jnp.zeros((L, M), jnp.float32)
        z_scr[0:csub, :] = jnp.zeros((csub, M), jnp.float32)
        trace_ref[0] = jnp.zeros(trace_ref.shape[1:], jnp.float32)
        y_ref[0] = mask_ref[:].astype(jnp.float32) * y_ref[0]

        def body(t, carry):
            tau2_prev, bnorm2 = carry
            coef = jnp.where(t == 0, 0.0, (P - bnorm2 / n) / tau2_prev)
            # forward: full col stage; row stage = block-combine + ONE
            # matmul for the support slab (H_fa[0, b] = +1 for all b)
            tall = col_stage(lambda j: b_scr[:, cs(j)])
            acc = None
            for a in range(f_a):
                lo = a * f_b
                wide = (tall[0][lo:lo + f_b, :] if m_a == 1 else
                        jnp.concatenate([tt[lo:lo + f_b, :] for tt in tall],
                                        axis=1))
                acc = wide if acc is None else acc + wide
            w0 = jax.lax.dot_general(
                hfb_ref[0:csub, :], acc.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            zt = (y_ref[0, 0:csub, :]
                  - mask_ref[0:csub, :].astype(jnp.float32)
                  * (w0 * inv_sqrt_n)
                  + coef * z_scr[0:csub, :])
            z_scr[0:csub, :] = zt
            tau2 = jnp.sum(zt * zt) / n
            # adjoint: col stage on csub rows only; row stage = one matmul
            # whose result is the SAME for every row slab (H_fa[a, 0] = +1)
            tallz = col_stage(lambda j: z_scr[0:csub, cs(j)])
            widez = (tallz[0] if m_a == 1 else
                     jnp.concatenate(tallz, axis=1))
            sw0 = jax.lax.dot_general(
                hfb_ref[:, 0:csub], widez.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            bnorm2_new = jnp.float32(0.0)
            for a in range(f_a):
                sqa = sq_ref[rs(a), :]
                s = sw0 * inv_sqrt_n + b_scr[rs(a), :]
                x = (sqa / tau2) * s
                x = x - jnp.max(x, axis=1, keepdims=True)
                e = jnp.exp(x)
                bnew = (sqa / jnp.sum(e, axis=1, keepdims=True)) * e
                b_scr[rs(a), :] = bnew
                bnorm2_new += jnp.sum(bnew * bnew)
            r_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            c_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            hit = (r_ids * 128 + c_ids) == t
            trace_ref[0] = jnp.where(hit, tau2, trace_ref[0])
            return tau2, bnorm2_new

        jax.lax.fori_loop(0, T, body,
                          (jnp.float32(jnp.inf), jnp.float32(0.0)))
        beta_ref[0] = b_scr[:]
    return kern


def make_kernel(mode, T, n, P, inv_sqrt_n, f_a, f_b, m_a, m_b):
    if mode.startswith("compact"):
        csub = f_b if mode == "compact" else int(mode[len("compact"):])
        return make_compact_kernel(T, n, P, inv_sqrt_n,
                                   f_a, f_b, m_a, m_b, csub)
    fold = mode in ("fold", "fold_sched")

    def kern(y_ref, mask_ref, hfb_ref, hmb_ref, sq_ref,
             beta_ref, trace_ref, z_scr, b_scr):
        from jax.experimental import pallas as pl

        L, M = b_scr.shape

        def rs(a):
            return pl.ds(a * f_b, f_b)

        def cs(j):
            return pl.ds(j * m_b, m_b)

        def radix(vals):
            if mode == "no_radix" or len(vals) == 1:
                return vals
            if mode == "bf16_radix":
                vals = [v.astype(jnp.bfloat16) for v in vals]
                return [v.astype(jnp.float32) for v in _fwht_blocks(vals)]
            return _fwht_blocks(vals)

        def fwht_slabs(read_tall):
            if mode == "midbf16":
                # column stage entirely in bf16: matmuls emit bf16, the
                # column radix runs on packed (16,128) bf16 lanes, and the
                # row matmul consumes bf16 directly (no cast pass at all);
                # f32 reappears only at the row-matmul accumulator.
                tall = [_mm(read_tall(j), hmb_ref[:]).astype(jnp.bfloat16)
                        for j in range(m_a)]
                tall = _fwht_blocks(tall) if m_a > 1 else tall
                rows = []
                for a in range(f_a):
                    lo = a * f_b
                    wide = (tall[0][lo:lo + f_b, :] if m_a == 1 else
                            jnp.concatenate(
                                [t[lo:lo + f_b, :] for t in tall], axis=1))
                    rows.append(jax.lax.dot_general(
                        hfb_ref[:], wide, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))
                return _fwht_blocks(rows) if f_a > 1 else rows
            if mode == "no_mm":
                tall = [read_tall(j).astype(jnp.bfloat16).astype(jnp.float32)
                        for j in range(m_a)]
            else:
                tall = [_mm(read_tall(j), hmb_ref[:]) for j in range(m_a)]
            tall = radix(tall)
            rows = []
            for a in range(f_a):
                lo = a * f_b
                wide = (tall[0][lo:lo + f_b, :] if m_a == 1 else
                        jnp.concatenate([t[lo:lo + f_b, :] for t in tall],
                                        axis=1))
                if mode == "no_mm":
                    rows.append(wide.astype(jnp.bfloat16).astype(jnp.float32))
                else:
                    rows.append(_mml(hfb_ref[:], wide))
            return radix(rows)

        b_scr[:] = jnp.zeros((L, M), jnp.float32)
        z_scr[:] = jnp.zeros((L, M), jnp.float32)
        trace_ref[0] = jnp.zeros(trace_ref.shape[1:], jnp.float32)
        if fold:
            # mask_ref arrives as f32 mask*inv_sqrt_n (premultiplied on
            # host); y_ref is folded with the raw 0/1 mask at trace time
            # outside, so in-kernel it just needs masking by sign of m.
            y_ref[0] = jnp.where(mask_ref[:] > 0.0, y_ref[0], 0.0)
        else:
            y_ref[0] = mask_ref[:].astype(jnp.float32) * y_ref[0]

        def body(t, carry):
            tau2_prev, bnorm2 = carry
            coef = jnp.where(t == 0, 0.0, (P - bnorm2 / n) / tau2_prev)
            w = fwht_slabs(lambda j: b_scr[:, cs(j)])
            tau2_acc = jnp.float32(0.0)
            for a in range(f_a):
                if mode == "no_consume":
                    zt = w[a]
                elif fold:
                    zt = (y_ref[0, rs(a), :]
                          - mask_ref[rs(a), :] * w[a]
                          + coef * z_scr[rs(a), :])
                elif mode == "fold_hfb":
                    # hfb carries inv_sqrt_n, so w is already scaled
                    zt = (y_ref[0, rs(a), :]
                          - mask_ref[rs(a), :].astype(jnp.float32) * w[a]
                          + coef * z_scr[rs(a), :])
                else:
                    zt = (y_ref[0, rs(a), :]
                          - mask_ref[rs(a), :].astype(jnp.float32)
                          * (w[a] * inv_sqrt_n)
                          + coef * z_scr[rs(a), :])
                z_scr[rs(a), :] = zt
                if mode not in ("sched", "fold_sched"):
                    tau2_acc += jnp.sum(zt * zt)
            tau2 = (jnp.float32(0.36) if mode in ("sched", "fold_sched")
                    else tau2_acc / n)
            sw = fwht_slabs(lambda j: z_scr[:, cs(j)])
            bnorm2_new = jnp.float32(0.0)
            for a in range(f_a):
                sqa = sq_ref[rs(a), :]
                if mode == "fold_hfb":
                    s = sw[a] + b_scr[rs(a), :]
                else:
                    s = sw[a] * inv_sqrt_n + b_scr[rs(a), :]
                if mode in ("no_softmax", "no_consume"):
                    bnew = (sqa / tau2) * s * jnp.float32(1e-3)
                elif mode == "exp2":
                    x = (sqa / tau2) * s
                    x = x - jnp.max(x, axis=1, keepdims=True)
                    e = jnp.exp2(x * jnp.float32(1.4426950408889634))
                    bnew = (sqa / jnp.sum(e, axis=1, keepdims=True)) * e
                else:
                    x = (sqa / tau2) * s
                    x = x - jnp.max(x, axis=1, keepdims=True)
                    e = jnp.exp(x)
                    bnew = (sqa / jnp.sum(e, axis=1, keepdims=True)) * e
                b_scr[rs(a), :] = bnew
                bnorm2_new += jnp.sum(bnew * bnew)
            if mode != "no_trace":
                r_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                c_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
                hit = (r_ids * 128 + c_ids) == t
                trace_ref[0] = jnp.where(hit, tau2, trace_ref[0])
            return tau2, bnorm2_new

        jax.lax.fori_loop(0, T, body,
                          (jnp.float32(jnp.inf), jnp.float32(0.0)))
        beta_ref[0] = b_scr[:]
    return kern


def make_pair_kernel(T, n, P, inv_sqrt_n, f_a, f_b, m_a, m_b):
    """Two codewords per program with stage-interleaved statements, hoping
    Mosaic co-issues one codeword's MXU matmuls with the other's VPU radix
    (the components measure fully serial within one codeword)."""
    def kern(y_ref, mask_ref, hfb_ref, hmb_ref, sq_ref,
             beta_ref, trace_ref, z_scr, b_scr):
        from jax.experimental import pallas as pl

        L, M = b_scr.shape[1], b_scr.shape[2]

        def rs(a):
            return pl.ds(a * f_b, f_b)

        def cs(j):
            return pl.ds(j * m_b, m_b)

        def col_stage(c):
            return [_mm(b_scr[c, :, cs(j)], hmb_ref[:]) for j in range(m_a)]

        def col_stage_z(c):
            return [_mm(z_scr[c, :, cs(j)], hmb_ref[:]) for j in range(m_a)]

        def rest(tall):
            tall = _fwht_blocks(tall) if m_a > 1 else tall
            rows = []
            for a in range(f_a):
                lo = a * f_b
                wide = (tall[0][lo:lo + f_b, :] if m_a == 1 else
                        jnp.concatenate([t[lo:lo + f_b, :] for t in tall],
                                        axis=1))
                rows.append(_mml(hfb_ref[:], wide))
            return _fwht_blocks(rows) if f_a > 1 else rows

        for c in range(2):
            b_scr[c] = jnp.zeros((L, M), jnp.float32)
            z_scr[c] = jnp.zeros((L, M), jnp.float32)
            y_ref[c] = mask_ref[:].astype(jnp.float32) * y_ref[c]
        trace_ref[0] = jnp.zeros(trace_ref.shape[1:], jnp.float32)

        def consume_z(c, w, coef):
            acc = jnp.float32(0.0)
            for a in range(f_a):
                zt = (y_ref[c, rs(a), :]
                      - mask_ref[rs(a), :].astype(jnp.float32)
                      * (w[a] * inv_sqrt_n)
                      + coef * z_scr[c, rs(a), :])
                z_scr[c, rs(a), :] = zt
                acc += jnp.sum(zt * zt)
            return acc

        def softmax(c, sw, tau2):
            acc = jnp.float32(0.0)
            for a in range(f_a):
                sqa = sq_ref[rs(a), :]
                s = sw[a] * inv_sqrt_n + b_scr[c, rs(a), :]
                x = (sqa / tau2) * s
                x = x - jnp.max(x, axis=1, keepdims=True)
                e = jnp.exp(x)
                bnew = (sqa / jnp.sum(e, axis=1, keepdims=True)) * e
                b_scr[c, rs(a), :] = bnew
                acc += jnp.sum(bnew * bnew)
            return acc

        def body(t, carry):
            t0a, t0b, bn_a, bn_b = carry
            coef_a = jnp.where(t == 0, 0.0, (P - bn_a / n) / t0a)
            coef_b = jnp.where(t == 0, 0.0, (P - bn_b / n) / t0b)
            # interleave: B's forward matmuls adjacent to A's radix/VPU
            tall_a = col_stage(0)
            tall_b = col_stage(1)
            w_a = rest(tall_a)
            w_b = rest(tall_b)
            tau2_a = consume_z(0, w_a, coef_a) / n
            tau2_b = consume_z(1, w_b, coef_b) / n
            sta = col_stage_z(0)
            stb = col_stage_z(1)
            sw_a = rest(sta)
            sw_b = rest(stb)
            bn_a = softmax(0, sw_a, tau2_a)
            bn_b = softmax(1, sw_b, tau2_b)
            r_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            c_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            hit = (r_ids * 128 + c_ids) == t
            trace_ref[0] = jnp.where(hit, tau2_a, trace_ref[0])
            return tau2_a, tau2_b, bn_a, bn_b

        jax.lax.fori_loop(0, T, body,
                          (jnp.float32(jnp.inf), jnp.float32(jnp.inf),
                           jnp.float32(0.0), jnp.float32(0.0)))
        beta_ref[:] = b_scr[:]
    return kern


def run_pair(model, B, T, reps=5):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cfg = model.cfg
    L, M, n, P = cfg.L, cfg.M, cfg.n, cfg.P
    f_b, m_b = 128, 128
    f_a, m_a = L // f_b, M // m_b
    import math as _m
    kern = make_pair_kernel(T, n, float(P), 1.0 / _m.sqrt(n),
                            f_a, f_b, m_a, m_b)
    G = B // 2
    call = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((B, L, M), jnp.float32),
                   jax.ShapeDtypeStruct((G, 8, 128), jnp.float32)),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((2, L, M), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, M), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f_b, f_b), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_b, m_b), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((2, L, M), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, L, M), jnp.float32),
            pltpu.VMEM((2, L, M), jnp.float32),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )

    mask2d = model.op.mask.reshape(L, M).astype(jnp.bfloat16)
    hfb = hadamard_factor(f_b, jnp.bfloat16)
    hmb = hadamard_factor(m_b, jnp.bfloat16)
    sq2 = model.sq_npl.reshape(L, 1)

    @jax.jit
    def block(keys):
        nkeys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
        y = jax.vmap(lambda k: jax.random.normal(k, (L, M)))(nkeys)
        beta, trace = call(y, mask2d, hfb, hmb, sq2)
        return jnp.sum(beta * beta), trace

    out = block(rngu.trial_keys(rngu.base_key(999), B))
    _ = float(out[0])
    times = []
    for r in range(reps):
        keys = rngu.trial_keys(rngu.base_key(r), B)
        t0 = time.perf_counter()
        out = block(keys)
        _ = float(out[0])
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def run_variant(mode, model, B, T, reps=5):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cfg = model.cfg
    L, M, n, P = cfg.L, cfg.M, cfg.n, cfg.P
    f_b, m_b = 128, 128
    if "f" in mode and "m" in mode and mode.startswith("f"):
        parts = mode[1:].split("m")
        f_b, m_b = int(parts[0]), int(parts[1])
    f_a, m_a = L // f_b, M // m_b
    kern = make_kernel(mode, T, n, float(P), 1.0 / math.sqrt(n),
                       f_a, f_b, m_a, m_b)
    call = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((B, L, M), jnp.float32),
                   jax.ShapeDtypeStruct((B, 8, 128), jnp.float32)),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, M), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, M), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f_b, f_b), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_b, m_b), lambda b: (0, 0),
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
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    mask2d = model.op.mask.reshape(L, M).astype(jnp.bfloat16)
    if mode in ("fold", "fold_sched"):
        mask2d = (model.op.mask.reshape(L, M).astype(jnp.float32)
                  / math.sqrt(n))
    if mode.startswith("compact"):
        # fabricated contiguous support: first n entries of N-space
        mc = np.zeros((L, M), np.float32)
        mc.reshape(-1)[:n] = 1.0
        mask2d = jnp.asarray(mc, jnp.bfloat16)
        assert n <= (f_b if mode == "compact"
                     else int(mode[len("compact"):])) * M, (n, mode)
    hfb = hadamard_factor(f_b, jnp.bfloat16)
    if mode == "fold_hfb":
        # +-inv_sqrt_n entries (bf16-rounded ~0.2% — timing-only variant)
        hfb = (hadamard_factor(f_b, jnp.float32)
               * (1.0 / math.sqrt(n))).astype(jnp.bfloat16)
    hmb = hadamard_factor(m_b, jnp.bfloat16)
    sq2 = model.sq_npl.reshape(L, 1)

    @jax.jit
    def block(keys):
        nkeys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
        y = jax.vmap(lambda k: jax.random.normal(k, (L, M)))(nkeys)
        beta, trace = call(y, mask2d, hfb, hmb, sq2)
        return jnp.sum(beta * beta), trace

    out = block(rngu.trial_keys(rngu.base_key(999), B))
    _ = float(out[0])
    times = []
    for r in range(reps):
        keys = rngu.trial_keys(rngu.base_key(r), B)
        t0 = time.perf_counter()
        out = block(keys)
        _ = float(out[0])
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    variants = sys.argv[1:] or ["full", "no_radix", "no_mm", "no_softmax",
                                "no_consume", "bf16_radix"]
    B, T = 1024, 32
    cfg = SparcConfig(L=1024, M=512, R=1.0, power_alloc="iterative",
                      op_kind="hadamard", amp_iters=T, amp_tol=0.0,
                      transform_precision="bf16", amp_kernel="fused_slab")
    model = SparcModel.build(cfg, ebno_db=2.0)
    print(f"devices: {jax.devices()}", file=sys.stderr)
    for mode in variants:
        t0 = time.perf_counter()
        if mode == "pair":
            med = run_pair(model, B, T)
        else:
            med = run_variant(mode, model, B, T)
        print(f"{mode:11s}: {med*1e3:7.1f} ms/block  "
              f"{med*1e6/(T*B):5.2f} us/iter/cw  "
              f"(compile+run {time.perf_counter()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
