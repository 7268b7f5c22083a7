"""Whole-decode-in-VMEM Pallas kernel for row-layered QC-LDPC BP.

SURVEY.md §7 hard-part 3 names the QC circulant layout as the TPU-native
LDPC form; ops/bp_qc.py realizes it in XLA with (B, J, K, Z) message
tensors routed by `take_along_axis` gathers.  The round-5 stage budget
(docs/PERF.md) put the shipped concat block at ~27% LLR+BP, so this
kernel attacks the BP share with three structural advantages the XLA
graph cannot express:

1. **Static rolls instead of gathers.**  Circulant shifts are COMPILE
   TIME constants, so every z-axis permutation is a two-slice concat
   (`x[s:] ++ x[:s]`) — pure sublane data movement, no gather engine.
2. **Trace-time sparsity.**  Inactive base-matrix blocks are skipped in
   the unrolled (j, k) loops; the XLA engine masks them but still pays
   their VPU work.  The 802.11n matrices are ~70% inactive (dv 3-4 of
   J=12), the array code is fully dense.
3. **Whole decode in VMEM.**  Messages (J, K, Z, B) + totals live on
   chip across all iterations with codewords on the LANE axis (Z on
   sublanes), so HBM sees exactly one LLR read and one posterior write
   per codeword.

Output parity: for minsum/oms the kernel computes the same f32 ops in
the same order as `bp_decode_qc(schedule="layered")` (min/compare/mul
only — no reassociated sums), so hard/ok/iters/posterior are expected
BITWISE equal; tests/test_ldpc_qc.py asserts exact equality in
interpret mode and models/ldpc.py auto-routes engine="qc" layered
decodes here on TPU backends only because of that equality (the
artifacts anchored on the XLA engine remain valid descriptions).

The exclusive-min is kept as a sequential two-min recurrence
(min1/min2 update per active block), which equals the reference
argmin/one-hot construction for every tie pattern: both yield
exc_k = min2 if mag_k == min1 else min1 with min2 the second-smallest
including duplicates of the minimum.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .bp import BpResult

# VMEM budget for the (J, K, Z, B) message tensor when picking the
# lane-block size; the ops/amp_kernel.py kernels run under the same
# 100 MB scoped budget, and transients (per-layer t_at/m_vc slices)
# need headroom on top of messages + totals + llr.
_MSG_VMEM_BYTES = 48 * 2 ** 20


def _roll_to_check(x: jax.Array, s: int) -> jax.Array:
    """t_at[zc] = x[(zc + s) % Z] — static circulant gather as a concat."""
    if s == 0:
        return x
    return jnp.concatenate([x[s:], x[:s]], axis=0)


def _roll_to_var(x: jax.Array, s: int) -> jax.Array:
    """tot[zv] = x[(zv - s) % Z] — the inverse permutation."""
    if s == 0:
        return x
    Z = x.shape[0]
    return jnp.concatenate([x[Z - s:], x[:Z - s]], axis=0)


def _make_kernel(shifts: Tuple[Tuple[int, ...], ...], Z: int, iters: int,
                 method: str, alpha: float, beta: float, clip: float):
    J, K = len(shifts), len(shifts[0])
    active = [[k for k in range(K) if shifts[j][k] >= 0] for j in range(J)]

    def kernel(llr_ref, tot_ref, flags_ref, mcv_ref):
        Bb = llr_ref.shape[-1]
        tot_ref[:] = jnp.clip(llr_ref[:], -clip, clip)
        mcv_ref[:] = jnp.zeros(mcv_ref.shape, mcv_ref.dtype)
        flags_ref[:] = jnp.zeros(flags_ref.shape, flags_ref.dtype)

        # done/iters live in the flags OUTPUT ref, not fori carries:
        # Mosaic rejects the (1, B) carried vectors with an "invalid
        # relayout: replicated in destination but not in source" error
        # (observed on-chip at B=512 and 3072); ref round trips sidestep
        # the carried-layout constraint entirely.
        def body(_, c):
            done = flags_ref[0:1, :] > 0           # (1, Bb) bool
            for j in range(J):
                act = active[j]
                m_vc = {}
                sgn = {}
                min1 = min2 = nneg = None
                for k in act:
                    ta = _roll_to_check(tot_ref[k], shifts[j][k])
                    mv = jnp.clip(ta - mcv_ref[j, k], -clip, clip)
                    m_vc[k] = mv
                    mag = jnp.abs(mv)
                    neg = mv < 0
                    sgn[k] = jnp.where(neg, -1.0, 1.0).astype(jnp.float32)
                    nneg = (neg.astype(jnp.int32) if nneg is None
                            else nneg + neg.astype(jnp.int32))
                    if min1 is None:
                        min1 = mag
                        min2 = jnp.full(mag.shape, jnp.inf, mag.dtype)
                    else:
                        is_new = mag < min1
                        min2 = jnp.where(is_new, min1,
                                         jnp.minimum(min2, mag))
                        min1 = jnp.minimum(min1, mag)
                sign_prod = (1 - 2 * (nneg & 1)).astype(jnp.float32)
                for k in act:
                    mag = jnp.abs(m_vc[k])
                    exc = jnp.where(mag == min1, min2, min1)
                    if method == "oms":
                        new_cv = ((sign_prod * sgn[k])
                                  * jnp.maximum(exc - beta, 0.0))
                    else:
                        new_cv = alpha * (sign_prod * sgn[k]) * exc
                    new_cv = jnp.clip(new_cv, -clip, clip)
                    t_new = _roll_to_var(m_vc[k] + new_cv, shifts[j][k])
                    # freeze converged lanes (done broadcasts (1,Bb) ->
                    # (Z,Bb)); messages need no freeze — a frozen lane's
                    # totals never move again, and only totals/ok/iters
                    # are outputs (same output contract as the scan's
                    # full-state freeze in ops/bp_qc.py)
                    tot_ref[k] = jnp.where(done, tot_ref[k], t_new)
                    mcv_ref[j, k] = new_cv
                # the XLA engine routes INACTIVE blocks through a
                # zero-message identity round trip whose m_vc is
                # clip(tot): totals get clipped at every (layer, inactive
                # column) — reproduce it exactly (bitwise contract)
                for k in range(K):
                    if shifts[j][k] < 0:
                        tot_ref[k] = jnp.where(
                            done, tot_ref[k],
                            jnp.clip(tot_ref[k], -clip, clip))
            bad = None
            for j in range(J):
                acc = None
                for k in active[j]:
                    hb = (tot_ref[k] < 0).astype(jnp.int32)
                    hb_at = _roll_to_check(hb, shifts[j][k])
                    acc = hb_at if acc is None else acc + hb_at
                row_bad = jnp.any((acc & 1) != 0, axis=0, keepdims=True)
                bad = row_bad if bad is None else (bad | row_bad)
            ok = ~bad
            flags_ref[1:2, :] = (flags_ref[1:2, :]
                                 + jnp.where(done, 0, 1).astype(jnp.int32))
            flags_ref[0:1, :] = (done | ok).astype(jnp.int32)
            return c

        jax.lax.fori_loop(0, iters, body, 0)

    return kernel, J, K


def _lane_block(J: int, K: int, Z: int, Bp: int) -> Tuple[int, int]:
    """(block, padded_B): largest lane block whose (J,K,Z,B) message
    tensor fits the VMEM budget, dividing the (re-)padded batch."""
    def fits(b):
        return J * K * Z * b * 4 <= _MSG_VMEM_BYTES
    if fits(Bp):
        return Bp, Bp
    b = 1024
    while b > 128 and not fits(b):
        b //= 2
    return b, ((Bp + b - 1) // b) * b


@functools.partial(
    jax.jit,
    static_argnames=("shifts", "Z", "iters", "method", "alpha", "beta",
                     "clip", "interpret"))
def bp_decode_qc_pallas(
    llr: jax.Array,               # (B, n), n = K*Z, variable order k*Z+zv
    shifts: Tuple[Tuple[int, ...], ...],   # static base matrix (-1 = zero)
    Z: int,
    iters: int = 32,
    method: str = "minsum",
    alpha: float = 0.8125,
    beta: float = 0.15,
    clip: float = 20.0,
    interpret: bool = False,
) -> BpResult:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if method not in ("minsum", "oms"):
        raise ValueError(f"pallas QC BP supports minsum/oms, got {method!r}")
    kernel, J, K = _make_kernel(shifts, Z, iters, method, alpha, beta, clip)
    B0, n = llr.shape
    assert n == K * Z, (n, K, Z)
    Bp = ((B0 + 127) // 128) * 128
    Bb, Bp = _lane_block(J, K, Z, Bp)
    x = jnp.transpose(llr.astype(jnp.float32).reshape(B0, K, Z), (1, 2, 0))
    if Bp != B0:
        # padded lanes carry llr=+clip (an all-zeros codeword): their
        # syndrome passes at iteration 1 and they freeze immediately
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Bp - B0)),
                    constant_values=clip)
    grid = Bp // Bb
    tot, flags = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((K, Z, Bb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((K, Z, Bb), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((2, Bb), lambda i: (0, i),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((K, Z, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((2, Bp), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((J, K, Z, Bb), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x)
    tot_flat = jnp.transpose(tot[:, :, :B0], (2, 0, 1)).reshape(B0, n)
    return BpResult(hard=(tot_flat < 0).astype(jnp.uint8),
                    posterior=tot_flat,
                    iters=flags[1, :B0],
                    ok=flags[0, :B0].astype(bool))
