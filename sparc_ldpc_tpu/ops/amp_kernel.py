"""Fused whole-AMP Pallas mega-kernel (SURVEY.md §7 M2 'speed-of-light').

The decisive observation: with the 2-factor Kronecker split N = L * M and
ML == N, the transform tile IS the denoiser tile —

    u = beta viewed as the (L, M) section matrix,
    FWHT(u) = H_L @ u @ H_M            (two MXU matmuls),
    denoiser = rowwise softmax on the same (L, M) tile.

So one Pallas program can hold a codeword's ENTIRE AMP state in VMEM and run
all T iterations with zero HBM round-trips: per codeword it reads y_N + the
mask once (~4 MB) and writes beta once, where the XLA path moves ~20 MB per
iteration per codeword.  The residual is kept in N-space (z_N = mask * (y_N
- A_full beta) + onsager), which in-kernel costs nothing extra and removes
the row gather/scatter entirely.

VMEM budget at (L, M) = (1024, 512), f32 state + bf16 Hadamard factors:
beta 2 + z 2 + y 2 + scratch 2 + H_L 2 + H_M 0.5 + mask 2 < 13 MB.

Scope guards (amp_decode falls back to the XLA path otherwise):
  ML == N, L <= 4096, M <= 1024.  SE tau2 schedules (SMEM constant),
  decision-feedback pinning (App. A.7 step 5), and amp_tol early stopping
  (in-kernel per-codeword freeze on every form — mono/split/slab — that
  saves real wall time, mean 22.8 iters at a T=32 cap on the flagship
  point) are all supported; amp_tol=0 gives fixed-T bitwise-reproducible
  traces.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .fwht import hadamard_factor


def _mm(a, b):
    """bf16 multiply, f32 accumulate (Hadamard entries are exact in bf16).

    b (the Hadamard factor) is already bf16; only the data operand is cast.
    """
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b,
        (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _fwht_blocks(bs):
    """FWHT across a list of equal-shape tiles via the Sylvester recursion:
    H_{2k} [top; bot] = [H_k top + H_k bot; H_k top - H_k bot].
    Pure VPU add/subs — for a small block count this beats a narrow
    f_a-contraction matmul by a wide margin (docs/PERF.md ablation)."""
    if len(bs) == 1:
        return bs
    half = len(bs) // 2
    t = _fwht_blocks(bs[:half])
    u = _fwht_blocks(bs[half:])
    return ([ti + ui for ti, ui in zip(t, u)]
            + [ti - ui for ti, ui in zip(t, u)])


def _fwht_blocks_inplace(ref, f_a, f_b):
    """Same transform, applied in place to the f_a row slabs of `ref`.

    H_{f_a} = (H_2)^(x)log2(f_a) applied along each bit axis of the slab
    index (axis order is immaterial for a Kronecker power), so the result
    equals the recursive value form — without materializing a concatenated
    (L, M) temp, which keeps only two slabs live per butterfly instead of
    the whole tile (matters at the 8 MB L=4096 tile size)."""
    from jax.experimental import pallas as pl

    d = 1
    while d < f_a:
        for i in range(f_a):
            if i & d == 0:
                lo, hi = pl.ds(i * f_b, f_b), pl.ds((i + d) * f_b, f_b)
                a0, a1 = ref[lo, :], ref[hi, :]
                ref[lo, :] = a0 + a1
                ref[hi, :] = a0 - a1
        d *= 2


def _fwht_cols_inplace(ref, m_a, m_b):
    """H_{m_a} across the m_a column blocks of `ref` (each m_b lanes wide),
    in place — the column-axis mirror of `_fwht_blocks_inplace`.  m_b must
    be a lane-tile multiple (128) so each slice is Mosaic-aligned."""
    from jax.experimental import pallas as pl

    d = 1
    while d < m_a:
        for j in range(m_a):
            if j & d == 0:
                lo, hi = pl.ds(j * m_b, m_b), pl.ds((j + d) * m_b, m_b)
                a0, a1 = ref[:, lo], ref[:, hi]
                ref[:, lo] = a0 + a1
                ref[:, hi] = a0 - a1
        d *= 2


def _mml(h, x):
    """Left-multiply by a bf16 Hadamard factor: h @ x, f32 accumulate."""
    return jax.lax.dot_general(
        h, x.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)



def _enc_amp_parts(sqo):
    """hi/lo split of the encode amplitudes (the ENCODE-path precision
    scheme).  The in-loop transforms run plain bf16 for speed (decoder-
    internal arithmetic, oracle-tracked), but the synthesized channel
    codeword is a SPEC quantity (E||x||^2/n = P): a plain bf16 encode was
    measured to shift codeword power systematically by +0.54% (+0.023 dB)
    — bf16's 7-bit mantissa rounds the clustered per-section amplitudes
    the same way — which at waterfall slope moved BER by ~6% outside the
    oracle CI (docs/PERF.md round 3).  Because a one-hot input propagates
    its amplitude EXACTLY through the transform (products with +-1 are
    exact, sums of exacts round at f32), encoding hi = f32(bf16(sqo)) and
    lo = sqo - hi in TWO passes of the fast bf16 transform and summing
    bounds the amplitude error at ~2^-16 relative (power error < 1e-7)
    for 2x the single-pass encode cost.  A plain-f32 MXU transform
    measured ~10x; a value-form bf16x2 helper ~6x (Mosaic lane-slicing).
    """
    hi = sqo.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, sqo - hi


def _amp_kernel_slab(T: int, n: int, P: float, inv_sqrt_n: float,
                     f_a: int, f_b: int, m_a: int, m_b: int,
                     has_sched: bool, has_pin: bool, has_enc: bool,
                     tol: float, *refs):
    """Block-value dataflow variant: the whole iteration is expressed on an
    (f_a, m_a) grid of (f_b, m_b) VALUE tiles, never materializing a full
    intermediate (L, M) tile in VMEM.

    Why: the staged in-place split kernel costs ~13 full-tile VMEM passes
    per transform (column matmuls write, 2 column-butterfly RMW passes,
    row-slab matmul RMW, 3 row-butterfly RMW passes); the measured kernel is
    VPU/VMEM-bound with the MXU at ~34% (docs/PERF.md).  Here every stage —
    column-block matmuls, column radix, row-slab matmuls, cross-slab row
    radix, residual update, softmax — flows value-to-value, so the only
    mandatory VMEM traffic per iteration is b_scr 2R+1W, z_scr 1R+1W,
    y 1R, mask 2R (plus whatever Mosaic spills for the cross-slab radix).

    Transform stages match the staged split kernel's f32 association (the
    value-form butterfly recursion `_fwht_blocks` applies the same ops in
    the same order); the tau2 / ||beta||^2 / softmax row reductions are
    reassociated as per-slab partial sums, so traces agree to rtol ~1e-2
    but are NOT bitwise identical to the split kernel (see the slab
    interpret-parity tests).

    Softmax row reductions span the m_a column blocks of a slab as
    max/sum-of-partials; pin rows are synthesized per slab from the pin
    index ref (matching the XLA path's post-denoise override, App. A.7
    step 5).
    """
    from jax.experimental import pallas as pl

    ((y_ref, mask_ref, hfb_ref, hmb_ref, sqi_ref, sqo_ref), sched_ref,
     pin_ref, enc_ref, _, (beta_ref, trace_ref, z_scr, b_scr)) = _unpack_refs(
        refs, 6, has_sched, has_pin, has_enc)
    L, M = b_scr.shape

    def rs(a):
        return pl.ds(a * f_b, f_b)

    def cs(j):
        return pl.ds(j * m_b, m_b)

    def fwht_slabs(read_tall):
        """Kronecker transform H_L (x) H_M; input read lazily as m_a TALL
        (L, m_b) column blocks, output returned as f_a WIDE (f_b, M) row
        slab values.  Matmul shapes are deliberately large — tall column
        matmuls stream L rows and wide row matmuls stream M columns through
        a stationary 128x128 Hadamard factor (an all-(128,128)-tile variant
        measured 28.5 vs 37.9 Mbit/s: small matmuls forfeit MXU weight
        reuse).  The radix stages are value-form (`_fwht_blocks`) with the
        same f32 association as the staged in-place butterflies."""
        tall = [_mm(read_tall(j), hmb_ref[:]) for j in range(m_a)]
        if m_a > 1:
            tall = _fwht_blocks(tall)
        rows = []
        for a in range(f_a):
            lo = a * f_b
            wide = (tall[0][lo:lo + f_b, :] if m_a == 1 else
                    jnp.concatenate([tl[lo:lo + f_b, :] for tl in tall],
                                    axis=1))
            rows.append(_mml(hfb_ref[:], wide))
        return _fwht_blocks(rows) if f_a > 1 else rows

    z_scr[:] = jnp.zeros((L, M), jnp.float32)
    trace_ref[0] = jnp.zeros(trace_ref.shape[1:], jnp.float32)
    # mask*y is loop-invariant: fold it into the aliased y block once
    # (mask_ref carries mask/n, so select on sign instead of multiplying).
    y_ref[0] = jnp.where(mask_ref[:] > 0.0, y_ref[0], 0.0)
    if has_enc:
        # In-kernel encode (round 3): y_ref arrived holding the MASKED
        # channel noise; synthesize the codeword here and add it.  One
        # extra transform (~1/T of kernel time) replaces the XLA encode
        # path (4 GB one-hot + HBM-streaming FWHT per block — measured
        # 24% of run_block wall at the headline shapes, docs/PERF.md).
        # beta0' = sqo * one_hot(idx) is beta0*sqrt(n), so the z-update
        # identity maskf*H(beta0') == mask o (A beta0) holds exactly.
        # Two hi/lo passes of the fast transform (_enc_amp_parts): the
        # codeword is a spec quantity.
        for part in _enc_amp_parts(sqo_ref[:]):
            for a in range(f_a):
                ida = enc_ref[0, rs(a), :]                   # (f_b, 1)
                cols = jax.lax.broadcasted_iota(jnp.int32, (f_b, M), 1)
                b_scr[rs(a), :] = jnp.where(cols == ida,
                                            part[a * f_b:(a + 1) * f_b, :],
                                            0.0)
            w = fwht_slabs(lambda j: b_scr[:, cs(j)])
            for a in range(f_a):
                y_ref[0, rs(a), :] = (mask_ref[rs(a), :] * w[a]
                                      + y_ref[0, rs(a), :])
    b_scr[:] = jnp.zeros((L, M), jnp.float32)

    def trace_write(t, val):
        r_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        c_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        hit = (r_ids * 128 + c_ids) == t
        trace_ref[0] = jnp.where(hit, val, trace_ref[0])

    def iterate(t, carry):
        # carrying ||beta||^2 forward from the softmax (where bnew is
        # already a live value) saves the whole-tile read at loop top.
        # Scale-free scheme (round-3; measured -3.4% in the fold_hfb
        # ablation, here exact in f32): b_scr holds beta*sqrt(n), mask_ref
        # holds mask/n, sqi/sqo hold sq*inv_sqrt_n / sq*sqrt(n), so the
        # two per-tile scale multiplies (w*inv, sw*inv) vanish and all
        # compensation lives in per-row/scalar constants.  z and tau2 stay
        # in TRUE scale, so stop rules and traces are unchanged.
        tau2_prev, bnorm2 = carry
        coef = jnp.where(t == 0, 0.0, (P - bnorm2 / (n * n)) / tau2_prev)
        w = fwht_slabs(lambda j: b_scr[:, cs(j)])
        tau2_acc = jnp.float32(0.0)
        for a in range(f_a):
            zt = (y_ref[0, rs(a), :]
                  - mask_ref[rs(a), :] * w[a]
                  + coef * z_scr[rs(a), :])
            z_scr[rs(a), :] = zt
            tau2_acc += jnp.sum(zt * zt)
        tau2 = sched_ref[t] if has_sched else tau2_acc / n
        # the adjoint re-reads z tall from z_scr (just written): one extra
        # tile read beats restitching tall blocks out of f_a wide values.
        sw = fwht_slabs(lambda j: z_scr[:, cs(j)])
        bnorm2_new = jnp.float32(0.0)
        for a in range(f_a):
            sqia = sqi_ref[rs(a), :]                      # (f_b, 1)
            sqoa = sqo_ref[rs(a), :]
            s = sw[a] + b_scr[rs(a), :]
            x = (sqia / tau2) * s
            x = x - jnp.max(x, axis=1, keepdims=True)
            e = jnp.exp(x)
            bnew = (sqoa / jnp.sum(e, axis=1, keepdims=True)) * e
            if has_pin:
                # in-kernel pin synthesis (see _amp_kernel_split)
                pidx = pin_ref[0, rs(a), :]               # (f_b, 1)
                pc = jax.lax.broadcasted_iota(jnp.int32, (f_b, M), 1)
                bnew = jnp.where(pidx >= 0,
                                 jnp.where(pc == pidx, sqoa, 0.0), bnew)
            b_scr[rs(a), :] = bnew
            bnorm2_new += jnp.sum(bnew * bnew)
        trace_write(t, tau2)
        return tau2, bnorm2_new

    if tol == 0.0:
        jax.lax.fori_loop(0, T, iterate,
                          (jnp.float32(jnp.inf), jnp.float32(0.0)))
    else:
        # per-codeword early stop, same freeze semantics as the split
        # kernel (see _amp_kernel_split): each grid program is one
        # codeword, so the cond skips the whole iteration's work.
        def body(t, carry):
            tau2_prev, bnorm2, done, iters = carry

            def frozen(_):
                trace_write(t, tau2_prev)
                return tau2_prev, bnorm2, jnp.float32(1.0), iters

            def active(_):
                tau2, bn = iterate(t, (tau2_prev, bnorm2))
                conv = jnp.abs(tau2 - tau2_prev) < tol * tau2
                return (tau2, bn, conv.astype(jnp.float32),
                        iters + jnp.float32(1.0))

            return jax.lax.cond(done > 0.0, frozen, active, 0)

        _, _, _, iters = jax.lax.fori_loop(
            0, T, body, (jnp.float32(jnp.inf), jnp.float32(0.0),
                         jnp.float32(0.0), jnp.float32(0.0)))
        trace_write(T, iters)
    # b_scr holds beta*sqrt(n) (scale-free scheme): one rescale per
    # codeword restores true scale, amortized over all T iterations.
    beta_ref[0] = b_scr[:] * inv_sqrt_n


def _unpack_refs(refs, n_in: int, has_sched: bool, has_pin: bool,
                 has_enc: bool = False, has_noise: bool = False):
    """Split the positional pallas refs into (inputs, sched, pin, [enc,
    noise,] rest).

    The optional SE tau2 schedule (SMEM (T,)), pin index tensor (VMEM
    (1, L, 1) int32; per-section pin targets, -1 = unpinned — the
    kernels synthesize the App. A.7 step-5 sq*one_hot rows in-kernel
    from the resident sqo constant), encode index tensor (VMEM (1, L, 1)
    int32; in-kernel codeword synthesis) and noise refs (SMEM (1, 2)
    uint32 per-codeword PRNG seed + SMEM (1, 1) f32 sigma; in-kernel
    channel synthesis) are appended to the input list only when present,
    so the unused cases pay no HBM traffic.
    """
    refs = list(refs)
    ins, refs = refs[:n_in], refs[n_in:]
    sched = refs.pop(0) if has_sched else None
    pin = refs.pop(0) if has_pin else None
    enc = refs.pop(0) if has_enc else None
    noise = (refs.pop(0), refs.pop(0)) if has_noise else None
    return ins, sched, pin, enc, noise, refs


def boxmuller_f32(bits1, bits2):
    """Two uint32 tiles -> one standard-normal f32 tile (Box-Muller).

    24-bit uniforms: u1 in (0, 1) (offset by 2^-25 so log never sees 0),
    u2 in [0, 1).  z = sqrt(-2 ln u1) * cos(2 pi u2).  The u1 floor
    truncates the tail at sqrt(-2 ln 2^-25) ~= 5.9 sigma
    (P ~= 3.6e-9 per draw — ~0.07 expected truncations per headline
    block of 1.9e7 draws, orders below every measured BER).  Pure jnp so
    the math is unit-testable on CPU (tests/test_ops.py); the kernel
    feeds it pltpu.prng_random_bits tiles.
    """
    # Mosaic has no uint32->f32 cast; the 24-bit values fit int32, so a
    # same-width bitcast then int32->f32 is exact (and identical on CPU).
    def to_f32(bits):
        return jax.lax.bitcast_convert_type(
            bits >> 8, jnp.int32).astype(jnp.float32)

    u1 = (to_f32(bits1) * (2.0 ** -24)) + (2.0 ** -25)
    u2 = to_f32(bits2) * (2.0 ** -24)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos((2.0 * math.pi) * u2)


def boxmuller_pair_f32(bits1, bits2):
    """Both Box-Muller outputs: two iid standard-normal tiles from one
    (u1, u2) pair — halves the log/sqrt/PRNG work per normal vs calling
    boxmuller_f32 twice (the VPU transcendental budget is what decides
    whether in-kernel noise pays — docs/PERF.md round 4)."""
    def to_f32(bits):
        return jax.lax.bitcast_convert_type(
            bits >> 8, jnp.int32).astype(jnp.float32)

    u1 = (to_f32(bits1) * (2.0 ** -24)) + (2.0 ** -25)
    theta = (2.0 * math.pi) * to_f32(bits2) * (2.0 ** -24)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(theta), r * jnp.sin(theta)


def _amp_kernel_split(T: int, n: int, P: float, inv_sqrt_n: float,
                      f_a: int, f_b: int, m_a: int, m_b: int,
                      vpu_outer: bool, has_sched: bool, has_pin: bool,
                      has_enc: bool, has_noise: bool, tol: float, *refs):
    """Split variant: the L-axis Hadamard factor is decomposed as
    H_L = H_{f_a} (x) H_{f_b}, so no O(L^2) constant is materialized
    (H_4096 bf16 is 32 MB and broke Mosaic compile; H_32 + H_128 are KBs).

    Transform of the (L, M) tile:
      1. columns:  H_M = H_{m_a} (x) H_{m_b} — per-column-block
         X[:, j m_b:(j+1) m_b] @ H_{m_b} matmuls, then H_{m_a} across the
         column blocks as VPU butterflies (m_a == 1 falls back to one
         X @ H_M matmul).  m_b = 128 cuts the M-stage MXU MACs/element
         from M to 128 at the price of log2(m_a) full-tile VPU passes.
      2. row blocks: for each a < f_a: X[a f_b:(a+1) f_b] = H_{f_b} @ block
      3. outer rows: H_{f_a} across the f_a row blocks — either VPU
         butterflies on whole (f_b, M) tiles (`vpu_outer`, unrolled slabs;
         the fast path for f_a <= 8), or one matmul on the (f_a, f_b*M)
         row-major view (large f_a, bounded code size).
    Step 3's reshape is layout-compatible (row-major concatenation).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if has_noise:
        # in-kernel channel synthesis: no y input at all — the masked
        # AWGN is generated below into the BETA OUTPUT block, which is
        # idle until the final post-loop write (zero extra VMEM; the
        # L=4096 split otherwise overflows the 100 MB scoped budget)
        (ins, sched_ref, pin_ref, enc_ref, noise_refs,
         (beta_ref, trace_ref, z_scr, b_scr, w_scr)) = _unpack_refs(
            refs, 6, has_sched, has_pin, has_enc, has_noise)
        mask_ref, hfa_ref, hfb_ref, hmb_ref, sqi_ref, sqo_ref = ins
        y_ref = beta_ref
    else:
        ((y_ref, mask_ref, hfa_ref, hfb_ref, hmb_ref, sqi_ref, sqo_ref),
         sched_ref, pin_ref, enc_ref, _,
         (beta_ref, trace_ref, z_scr, b_scr, w_scr)) = _unpack_refs(
            refs, 7, has_sched, has_pin, has_enc)
    L, M = b_scr.shape
    mask = mask_ref[:]                  # carries mask/n (scale-free scheme)
    sqi = sqi_ref[:]                    # sq * inv_sqrt_n
    sqo = sqo_ref[:]                    # sq * sqrt(n)

    def fwht_tile(x):
        if m_a == 1:
            w_scr[:] = _mm(x, hmb_ref[:])
        else:
            for j in range(m_a):
                cs = pl.ds(j * m_b, m_b)
                w_scr[:, cs] = _mm(x[:, j * m_b:(j + 1) * m_b], hmb_ref[:])
            _fwht_cols_inplace(w_scr, m_a, m_b)
        if vpu_outer:
            for a in range(f_a):
                blk = w_scr[pl.ds(a * f_b, f_b), :]
                w_scr[pl.ds(a * f_b, f_b), :] = jax.lax.dot_general(
                    hfb_ref[:], blk.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            _fwht_blocks_inplace(w_scr, f_a, f_b)
            return w_scr[:]
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
            hfa_ref[:], w2.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return w2.reshape(L, M)

    b_scr[:] = jnp.zeros((L, M), jnp.float32)
    z_scr[:] = jnp.zeros((L, M), jnp.float32)
    trace_ref[0] = jnp.zeros(trace_ref.shape[1:], jnp.float32)
    if has_noise:
        # In-kernel channel synthesis (round-3 VERDICT item 6): draw the
        # masked AWGN from the per-core Pallas PRNG (seeded per codeword
        # with two threefry-derived words) instead of reading an embedded
        # (B, L, M) noise buffer from HBM — the XLA-side draw, the
        # N-space scatter write, and the kernel's HBM read of y (measured
        # 14.7% of headline block wall, scripts/noise_probe.py) all
        # disappear.  Distribution-identical but NOT the same draws as
        # the jax.random stream: opt-in via amp_noise_in_kernel.
        seed_ref, sig_ref = noise_refs
        pltpu.prng_seed(seed_ref[0, 0, 0], seed_ref[0, 0, 1])
        # both Box-Muller outputs fill the tile from half the bits and
        # half the log/sqrt work (the two outputs of one (u1, u2) pair
        # are iid normals; their placement across the tile is immaterial)
        mh = M // 2
        bits1 = pltpu.bitcast(pltpu.prng_random_bits((L, mh)), jnp.uint32)
        bits2 = pltpu.bitcast(pltpu.prng_random_bits((L, mh)), jnp.uint32)
        zc, zs = boxmuller_pair_f32(bits1, bits2)
        y_ref[0] = jnp.where(
            mask > 0.0,
            sig_ref[0, 0] * jnp.concatenate([zc, zs], axis=1), 0.0)
    else:
        # mask*y is loop-invariant: fold it into the aliased y block once
        # so the loop does one full-tile multiply per residual update
        # instead of two (mask carries mask/n: select on sign).
        y_ref[0] = jnp.where(mask > 0.0, y_ref[0], 0.0)

    def y_get():
        return y_ref[0]

    def y_set(v):
        y_ref[0] = v
    if has_enc or has_pin:
        cols = jax.lax.broadcasted_iota(jnp.int32, (L, M), 1)
    if has_enc:
        # In-kernel encode (see _amp_kernel_slab): y arrived holding the
        # masked channel noise; add maskf * H(sqo * one_hot(idx)) in
        # two hi/lo passes (_enc_amp_parts — the codeword is a spec
        # quantity).
        for part in _enc_amp_parts(sqo):
            b0 = jnp.where(cols == enc_ref[0], part, 0.0)
            y_set(mask * fwht_tile(b0) + y_get())

    def trace_write(t, val):
        r_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        c_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        hit = (r_ids * 128 + c_ids) == t
        trace_ref[0] = jnp.where(hit, val, trace_ref[0])

    def iterate(t, tau2_prev):
        # Scale-free scheme (see _amp_kernel_slab): b_scr holds
        # beta*sqrt(n); both per-tile scale multiplies vanish, z and tau2
        # stay in true scale.
        beta = b_scr[:]
        bnorm2 = jnp.sum(beta * beta)
        coef = jnp.where(t == 0, 0.0, (P - bnorm2 / (n * n)) / tau2_prev)
        w = fwht_tile(beta)
        z = y_get() - mask * w + coef * z_scr[:]
        z_scr[:] = z
        if has_sched:
            tau2 = sched_ref[t]
        else:
            tau2 = jnp.sum(z * z) / n
        s = fwht_tile(z) + b_scr[:]
        # divisions are many-cycle VPU ops: do them once per row/scalar and
        # broadcast the reciprocal as a multiply over the (L, M) tile.
        a = (sqi / tau2) * s
        a = a - jnp.max(a, axis=1, keepdims=True)
        e = jnp.exp(a)
        bnew = (sqo / jnp.sum(e, axis=1, keepdims=True)) * e
        if has_pin:
            # pin rows synthesized from the (L, 1) index ref: sq*one_hot
            # in beta*sqrt(n) scale IS sqo at the hit column — bitwise
            # the round-4 pin-tensor semantics (idx -1 never matches).
            pidx = pin_ref[0]
            bnew = jnp.where(pidx >= 0,
                             jnp.where(cols == pidx, sqo, 0.0), bnew)
        b_scr[:] = bnew
        trace_write(t, tau2)
        return tau2

    if tol == 0.0:
        # fixed-T semantics: no conditionals at all (bitwise round-1 path)
        jax.lax.fori_loop(0, T, iterate, jnp.float32(jnp.inf))
    else:
        # per-codeword early stop (XLA scan freeze semantics): a codeword
        # whose tau2 plateaued within tol skips the whole iteration —
        # unlike the lax.scan mask, the skip saves real time because each
        # grid program is one codeword.  conv is evaluated on the iteration
        # that ran; the NEXT iteration is the first frozen one, and frozen
        # iterations copy tau2_prev into the trace exactly like the scan.
        def body(t, carry):
            tau2_prev, done, iters = carry

            def frozen(_):
                trace_write(t, tau2_prev)
                return tau2_prev, jnp.float32(1.0), iters

            def active(_):
                tau2 = iterate(t, tau2_prev)
                conv = jnp.abs(tau2 - tau2_prev) < tol * tau2
                return (tau2, conv.astype(jnp.float32),
                        iters + jnp.float32(1.0))

            return jax.lax.cond(done > 0.0, frozen, active, 0)

        _, _, iters = jax.lax.fori_loop(
            0, T, body,
            (jnp.float32(jnp.inf), jnp.float32(0.0), jnp.float32(0.0)))
        # iterations-used count rides the spare trace slot T (T <= 1023
        # when tol > 0; amp_fused unpacks it into AmpResult.iters)
        trace_write(T, iters)
    # b_scr holds beta*sqrt(n) (scale-free scheme): one rescale per
    # codeword restores true scale, amortized over all T iterations.
    beta_ref[0] = b_scr[:] * inv_sqrt_n


def _amp_kernel(T: int, n: int, P: float, inv_sqrt_n: float,
                has_sched: bool, has_pin: bool, has_enc: bool,
                tol: float, *refs):
    """One codeword's full AMP run; grid = (B,).

    Refs: y (1, L, M) N-space embedded observation; mask (L, M) row
    support scaled to mask/n (scale-free scheme); hl (L, L), hm (M, M)
    Hadamard factors; sqi/sqo (L, 1) pre-scaled sqrt(n P_l) constants
    (x inv_sqrt_n / x sqrt(n)); optional SE tau2 schedule (SMEM (T,))
    and pin index tensor (1, L, 1) int32 (-1 = unpinned).
    Outputs: beta (1, L, M) true scale; trace (1, 8, 128) tau2 trace.
    Scratch: z (L, M) N-space residual (true scale), b (L, M) beta
    state x sqrt(n), both f32.
    """
    ((y_ref, mask_ref, hl_ref, hm_ref, sqi_ref, sqo_ref), sched_ref,
     pin_ref, enc_ref, _, (beta_ref, trace_ref, z_scr, b_scr)) = _unpack_refs(
        refs, 6, has_sched, has_pin, has_enc)
    L, M = b_scr.shape
    # NOTE: y_ref is aliased with beta_ref (input_output_aliases) to halve
    # the double-buffered block footprint; copy y into VMEM-scratch-free
    # registers is not possible, so we read it from the shared buffer all
    # loop long and only overwrite it at the very end.
    mask = mask_ref[:]                  # carries mask/n (scale-free scheme)
    sqi = sqi_ref[:]                    # sq * inv_sqrt_n
    sqo = sqo_ref[:]                    # sq * sqrt(n)

    b_scr[:] = jnp.zeros((L, M), jnp.float32)
    z_scr[:] = jnp.zeros((L, M), jnp.float32)
    trace_ref[0] = jnp.zeros(trace_ref.shape[1:], jnp.float32)
    # fold the loop-invariant mask*y into the aliased y block once
    # (mask carries mask/n, so select on sign instead of multiplying)
    y_ref[0] = jnp.where(mask > 0.0, y_ref[0], 0.0)
    if has_enc or has_pin:
        cols = jax.lax.broadcasted_iota(jnp.int32, (L, M), 1)
    if has_enc:
        # In-kernel encode (see _amp_kernel_slab); two hi/lo passes —
        # the codeword is a spec quantity (_enc_amp_parts)
        for part in _enc_amp_parts(sqo):
            b0 = jnp.where(cols == enc_ref[0], part, 0.0)
            y_ref[0] = (mask * _mm(hl_ref[:], _mm(b0, hm_ref[:]))
                        + y_ref[0])

    def trace_write(t, val):
        # Mosaic cannot store scalars to VMEM: write the tau2 trace as a
        # masked RMW of the whole (8, 128) tile (4 KB, negligible).
        r_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        c_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        hit = (r_ids * 128 + c_ids) == t
        trace_ref[0] = jnp.where(hit, val, trace_ref[0])

    def iterate(t, tau2_prev):
        # Scale-free scheme (see _amp_kernel_slab): b_scr holds
        # beta*sqrt(n); the per-tile scale multiplies are folded into the
        # mask (mask/n) and the per-row softmax constants.
        beta = b_scr[:]
        z = z_scr[:]
        bnorm2 = jnp.sum(beta * beta)
        coef = jnp.where(t == 0, 0.0, (P - bnorm2 / (n * n)) / tau2_prev)
        # forward transform (unnormalized): W' = H_L @ (beta' @ H_M)
        w = _mm(hl_ref[:], _mm(beta, hm_ref[:]))
        z = y_ref[0] - mask * w + coef * z
        z_scr[:] = z
        if has_sched:
            tau2 = sched_ref[t]
        else:
            tau2 = jnp.sum(z * z) / n
        # adjoint (self-adjoint transform, same tile)
        s = _mm(hl_ref[:], _mm(z, hm_ref[:])) + beta
        # per-row reciprocals instead of (L, M) elementwise divisions
        a = (sqi / tau2) * s
        a = a - jnp.max(a, axis=1, keepdims=True)
        e = jnp.exp(a)
        bnew = (sqo / jnp.sum(e, axis=1, keepdims=True)) * e
        if has_pin:
            # in-kernel pin synthesis (see _amp_kernel_split)
            pidx = pin_ref[0]
            bnew = jnp.where(pidx >= 0,
                             jnp.where(cols == pidx, sqo, 0.0), bnew)
        b_scr[:] = bnew
        trace_write(t, tau2)
        return tau2

    if tol == 0.0:
        jax.lax.fori_loop(0, T, iterate, jnp.float32(jnp.inf))
    else:
        # per-codeword early stop (grid = one codeword per program, so the
        # cond skips real work — same semantics as _amp_kernel_split)
        def body(t, carry):
            tau2_prev, done, iters = carry

            def frozen(_):
                trace_write(t, tau2_prev)
                return tau2_prev, jnp.float32(1.0), iters

            def active(_):
                tau2 = iterate(t, tau2_prev)
                conv = jnp.abs(tau2 - tau2_prev) < tol * tau2
                return (tau2, conv.astype(jnp.float32),
                        iters + jnp.float32(1.0))

            return jax.lax.cond(done > 0.0, frozen, active, 0)

        _, _, iters = jax.lax.fori_loop(
            0, T, body,
            (jnp.float32(jnp.inf), jnp.float32(0.0), jnp.float32(0.0)))
        trace_write(T, iters)
    # b_scr holds beta*sqrt(n) (scale-free scheme): one rescale per
    # codeword restores true scale, amortized over all T iterations.
    beta_ref[0] = b_scr[:] * inv_sqrt_n


def _fwht_tile_kernel(f_a: int, f_b: int, m_a: int, m_b: int, scale: float,
                      vpu_outer: bool,
                      x_ref, hfa_ref, hfb_ref, hmb_ref, o_ref, w_scr):
    """Standalone (l, M) tile transform: H_l (x) H_M via the same factored
    scheme as the fused AMP kernel (column-block H_{m_b} matmuls + VPU
    column butterflies; row-slab H_{f_b} matmuls + VPU row butterflies).

    This is the *local* super-stage of the section-sharded fused AMP path
    (parallel/amp_sharded.py): each device transforms its (L/S, M) slab
    in VMEM, then the cross-shard H_S factor runs as hypercube ppermute
    butterflies outside the kernel (SURVEY.md §5 long-context analog).
    """
    from jax.experimental import pallas as pl

    l, M = w_scr.shape
    x = x_ref[:]
    if m_a == 1:
        w_scr[:] = _mm(x, hmb_ref[:])
    else:
        for j in range(m_a):
            w_scr[:, pl.ds(j * m_b, m_b)] = _mm(
                x[:, j * m_b:(j + 1) * m_b], hmb_ref[:])
        _fwht_cols_inplace(w_scr, m_a, m_b)
    for a in range(f_a):
        blk = w_scr[pl.ds(a * f_b, f_b), :]
        w_scr[pl.ds(a * f_b, f_b), :] = jax.lax.dot_general(
            hfb_ref[:], blk.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    if vpu_outer:
        _fwht_blocks_inplace(w_scr, f_a, f_b)
        o_ref[:] = w_scr[:] * scale if scale != 1.0 else w_scr[:]
    else:
        w2 = w_scr[:].reshape(f_a, f_b * M)
        w2 = jax.lax.dot_general(
            hfa_ref[:], w2.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        w2 = w2.reshape(l, M)
        o_ref[:] = w2 * scale if scale != 1.0 else w2


def fwht_tile_pallas(x: jax.Array,          # (B, l, M)
                     scale: float = 1.0,
                     f_b: int = 128,
                     m_b: int = 0,
                     vpu_outer_max: int = 32,
                     interpret: bool = False) -> jax.Array:
    """Per-codeword Kronecker transform H_l (x) H_M of (B, l, M) tiles
    (equals the length-l*M FWHT of each row-major-flattened tile)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, l, M = x.shape
    f_b = min(f_b, l)
    assert l % f_b == 0, (l, f_b)
    f_a = l // f_b
    if not m_b:
        m_b = 128 if (M > 128 and M % 128 == 0) else M
    assert M % m_b == 0 and (m_b == M or m_b % 128 == 0), (M, m_b)
    m_a = M // m_b
    vpu_outer = f_a <= vpu_outer_max
    kernel = functools.partial(_fwht_tile_kernel, f_a, f_b, m_a, m_b,
                               float(scale), vpu_outer)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B * l, M), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((l, M), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f_a, f_a), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_b, f_b), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_b, m_b), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((l, M), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((l, M), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x.reshape(B * l, M).astype(jnp.float32),
      hadamard_factor(f_a, jnp.bfloat16),
      hadamard_factor(f_b, jnp.bfloat16),
      hadamard_factor(m_b, jnp.bfloat16))
    return out.reshape(B, l, M)


def amp_fused(y_n: jax.Array | None,   # (B, L, M) N-space embedded y
              mask: jax.Array,         # (L, M)
              sq_npl: jax.Array,       # (L,)
              P: float, n: int, T: int,
              interpret: bool = False,
              split: bool | None = None,
              vpu_outer_max: int = 32,
              f_b: int = 128,
              m_b: int = 0,
              tau2_schedule: jax.Array | None = None,   # (T,) SE schedule
              pin_idx: jax.Array | None = None,         # (B, L) int32, -1=off
              form: str | None = None,   # None=auto | "slab"|"split"|"mono"
              tol: float = 0.0,          # per-codeword early stop (split)
              encode_idx: jax.Array | None = None,   # (B, L) int32
              noise_seed: jax.Array | None = None,   # (B, 2) uint32
              noise_sigma: jax.Array | None = None,  # scalar f32
              ):
    """Run the fused kernel: returns (beta (B, L, M), tau2_trace (T, B)),
    plus iters (B,) as a third element when tol > 0.

    tau2_schedule replaces the online ||z||^2/n estimate with a
    state-evolution schedule (SMEM constant).  pin_idx implements the
    decision-feedback pinning of App. A.7 step 5 from per-section INDICES
    (-1 = unpinned): rows with idx >= 0 are overridden with sq*one_hot(idx)
    after every denoise, synthesized in-kernel by an iota-compare against
    the sqo constant already in VMEM.  Bitwise-identical to the round-4
    (B, L, M) f32 pin-tensor input (pinned rows held exactly sqo), but the
    XLA-side one-hot materialization and the per-codeword HBM pin stream
    (~2 GB/feedback block at the shipped concat shapes) disappear — the
    kernel reads a (B, L) int32 instead (round 5, docs/PERF.md).
    tol > 0 enables the in-kernel per-codeword early stop (XLA-scan freeze
    semantics) on EVERY kernel form — mono, split, and slab: each grid
    program is one codeword, so the `lax.cond` skip saves real wall time,
    unlike the scan's mask.  tau2 schedules have no online estimate to
    compare, so the caller must pass tol=0 with a schedule.

    encode_idx (B, L) int32 enables IN-KERNEL ENCODE: y_n must then hold
    the channel noise embedded in N-space (mask support), and the kernel
    synthesizes y = mask o (A beta0) + noise itself from the per-section
    true indices — one extra in-kernel transform replaces the XLA
    one-hot/encode-FWHT pipeline (measured 24% of run_block wall at the
    headline shapes; docs/PERF.md round 3).

    noise_seed (B, 2) uint32 + noise_sigma additionally enable IN-KERNEL
    NOISE (round 4): y_n is dropped entirely (pass None) and the kernel
    draws the masked AWGN itself (pltpu PRNG + Box-Muller, seeded per
    codeword), removing the last (B, L, M) HBM materialization of the
    trial path (14.7% of headline block wall — scripts/noise_probe.py).
    Requires encode_idx, the split form, and a real TPU (the Pallas
    interpreter has no PRNG lowering); distribution-identical to the XLA
    noise but a different stream, so it is opt-in (amp_noise_in_kernel).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    has_noise = noise_seed is not None
    if has_noise:
        assert encode_idx is not None, \
            "in-kernel noise requires in-kernel encode (no y to embed)"
        assert not interpret, \
            "pltpu PRNG has no interpreter lowering; use the XLA noise path"
        B, L = encode_idx.shape
        M = mask.shape[1]
    else:
        B, L, M = y_n.shape
    assert T <= 1024, "trace buffer holds 1024 iterations"
    assert tol == 0.0 or T <= 1023, "early stop rides trace slot T"
    inv_sqrt_n = 1.0 / math.sqrt(n)
    has_sched = tau2_schedule is not None
    has_pin = pin_idx is not None
    extra_in, extra_specs = [], []
    if has_sched:
        extra_in.append(jnp.asarray(tau2_schedule, jnp.float32))
        extra_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    if has_pin:
        # per-section pin indices (-1 = unpinned); the kernels synthesize
        # the sq*one_hot rows in beta*sqrt(n) scale from the resident sqo
        extra_in.append(pin_idx.reshape(B, L, 1).astype(jnp.int32))
        extra_specs.append(pl.BlockSpec((1, L, 1), lambda b: (b, 0, 0),
                                        memory_space=pltpu.VMEM))
    has_enc = encode_idx is not None
    if has_enc:
        extra_in.append(encode_idx.reshape(B, L, 1).astype(jnp.int32))
        extra_specs.append(pl.BlockSpec((1, L, 1), lambda b: (b, 0, 0),
                                        memory_space=pltpu.VMEM))
    if has_noise:
        # (B, 1, 2) so the per-program block's trailing dims equal the
        # array dims (Mosaic SMEM blocking constraint)
        extra_in.append(noise_seed.reshape(B, 1, 2).astype(jnp.uint32))
        extra_specs.append(pl.BlockSpec((1, 1, 2), lambda b: (b, 0, 0),
                                        memory_space=pltpu.SMEM))
        extra_in.append(jnp.asarray(noise_sigma,
                                    jnp.float32).reshape(1, 1))
        extra_specs.append(pl.BlockSpec((1, 1), lambda b: (0, 0),
                                        memory_space=pltpu.SMEM))
    common = dict(
        out_shape=(jax.ShapeDtypeStruct((B, L, M), jnp.float32),
                   jax.ShapeDtypeStruct((B, 8, 128), jnp.float32)),
        grid=(B,),
        out_specs=(
            pl.BlockSpec((1, L, M), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        # the default scoped-vmem limit is 16 MB; v5e accepts far more —
        # raise the cap instead of shrinking tiles (docs/PERF.md).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    if not has_noise:
        # alias y_n with the beta output: y is only read during the loop
        # and beta is written after it, so sharing the (1, L, M) block
        # halves the double-buffered VMEM footprint.  (With in-kernel
        # noise there is no y input; beta gets its own block.)
        common["input_output_aliases"] = {0: 0}
    tile_specs = [
        pl.BlockSpec((1, L, M), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((L, M), lambda b: (0, 0), memory_space=pltpu.VMEM),
    ]
    # scale-free scheme constants: the kernels keep beta scaled by sqrt(n)
    # so every per-tile scale multiply folds into these (exact in f32 —
    # unlike folding inv_sqrt_n into the bf16 Hadamard factors).
    mask_n = mask.astype(jnp.float32) / n
    sqi2 = (sq_npl * inv_sqrt_n).reshape(L, 1)
    sqo2 = (sq_npl * math.sqrt(n)).reshape(L, 1)
    sq_spec = pl.BlockSpec((L, 1), lambda b: (0, 0),
                           memory_space=pltpu.VMEM)
    # The split variant is mandatory above L=1024 (the monolithic H_L
    # constant breaks Mosaic compile) and optional below it: it trades the
    # O(L) per-element transform cost for O(f_a + f_b), i.e. ~2.4x fewer
    # transform FLOPs at L=1024, at the price of a narrow f_a-contraction
    # matmul.  A/B-measured via amp_kernel="fused_split" (docs/PERF.md).
    use_split = (L > 1024) if split is None else split
    if form is None:
        form = "split" if use_split else "mono"
    elif form == "split":
        use_split = True          # form routes (ADVICE r2): split forced
    elif form == "mono":
        assert L <= 1024, "monolithic H_L constant breaks Mosaic above 1024"
        use_split = False
    else:
        assert form == "slab", form
    if has_noise:
        assert form != "slab" and use_split, (
            "in-kernel noise is implemented on the split form only "
            "(the shipped headline kernel); callers gate on amp_kernel")
    if form == "slab":
        f_b = min(f_b, L)
        assert L % f_b == 0, (L, f_b)
        f_a = L // f_b
        if not m_b:
            m_b = 128 if (M > 128 and M % 128 == 0) else M
        assert M % m_b == 0 and (m_b == M or m_b % 128 == 0), (M, m_b)
        m_a = M // m_b
        kernel = functools.partial(_amp_kernel_slab, T, n, float(P),
                                   inv_sqrt_n, f_a, f_b, m_a, m_b,
                                   has_sched, has_pin, has_enc, float(tol))
        beta, trace = pl.pallas_call(
            kernel,
            in_specs=tile_specs + [
                pl.BlockSpec((f_b, f_b), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((m_b, m_b), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                sq_spec, sq_spec,
            ] + extra_specs,
            scratch_shapes=[
                pltpu.VMEM((L, M), jnp.float32),
                pltpu.VMEM((L, M), jnp.float32),
            ],
            **common,
        )(y_n, mask_n,
          hadamard_factor(f_b, jnp.bfloat16),
          hadamard_factor(m_b, jnp.bfloat16),
          sqi2, sqo2, *extra_in)
        flat = trace.reshape(B, 8 * 128)
        tr = flat[:, :T].T
        if tol:
            return beta, tr, flat[:, T].astype(jnp.int32)
        return beta, tr
    if not use_split:
        hl = hadamard_factor(L, jnp.bfloat16)
        hm = hadamard_factor(M, jnp.bfloat16)
        kernel = functools.partial(_amp_kernel, T, n, float(P), inv_sqrt_n,
                                   has_sched, has_pin, has_enc, float(tol))
        beta, trace = pl.pallas_call(
            kernel,
            in_specs=tile_specs + [
                pl.BlockSpec((L, L), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((M, M), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                sq_spec, sq_spec,
            ] + extra_specs,
            scratch_shapes=[
                pltpu.VMEM((L, M), jnp.float32),
                pltpu.VMEM((L, M), jnp.float32),
            ],
            **common,
        )(y_n, mask_n, hl, hm, sqi2, sqo2, *extra_in)
    else:
        # decompose H_L = H_{f_a} (x) H_{f_b}; no O(L^2) constant.  The
        # outer H_{f_a} runs as VPU tile butterflies when f_a is small
        # (unrolled; A/B'd fastest at L=1024 — docs/PERF.md) and as one
        # matmul on the (f_a, f_b*M) view for large f_a (code-size bound).
        f_b = min(f_b, L)          # small-L configs: single row factor
        assert L % f_b == 0, (L, f_b)
        f_a = L // f_b
        if not m_b:
            # auto: factor H_M down to the 128-lane MXU tile when possible —
            # A/B at (B,L,M,T)=(1024,1024,512,32): 354 -> 225 ms/block and
            # compile 212 s -> 3 s vs the monolithic X @ H_512 (docs/PERF.md)
            m_b = 128 if (M > 128 and M % 128 == 0) else M
        assert M % m_b == 0, (M, m_b)
        m_a = M // m_b
        assert m_a == 1 or m_b % 128 == 0, (M, m_b)
        vpu_outer = f_a <= vpu_outer_max
        hfa = hadamard_factor(f_a, jnp.bfloat16)
        hfb = hadamard_factor(f_b, jnp.bfloat16)
        hmb = hadamard_factor(m_b, jnp.bfloat16)
        kernel = functools.partial(_amp_kernel_split, T, n, float(P),
                                   inv_sqrt_n, f_a, f_b, m_a, m_b,
                                   vpu_outer, has_sched, has_pin, has_enc,
                                   has_noise, float(tol))
        factor_specs = [
            pl.BlockSpec((f_a, f_a), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_b, f_b), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_b, m_b), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        scratch = [
            pltpu.VMEM((L, M), jnp.float32),
            pltpu.VMEM((L, M), jnp.float32),
            pltpu.VMEM((L, M), jnp.float32),
        ]
        if has_noise:
            # no y input; the beta OUT block doubles as the y buffer
            # during the loop (it is only written after it)
            beta, trace = pl.pallas_call(
                kernel,
                in_specs=[tile_specs[1]] + factor_specs
                         + [sq_spec, sq_spec] + extra_specs,
                scratch_shapes=scratch,
                **common,
            )(mask_n, hfa, hfb, hmb, sqi2, sqo2, *extra_in)
        else:
            beta, trace = pl.pallas_call(
                kernel,
                in_specs=tile_specs + factor_specs
                         + [sq_spec, sq_spec] + extra_specs,
                scratch_shapes=scratch,
                **common,
            )(y_n, mask_n, hfa, hfb, hmb, sqi2, sqo2, *extra_in)
    # unpack padded trace -> (T, B); slot T carries the per-codeword
    # iterations-used count when the early stop is on
    flat = trace.reshape(B, 8 * 128)
    tr = flat[:, :T].T
    if tol:
        return beta, tr, flat[:, T].astype(jnp.int32)
    return beta, tr
