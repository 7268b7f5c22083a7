"""Section-sharded fused AMP (VERDICT round-1 missing #1; SURVEY.md §5
"long-context analog", §2 #24-25).

Round 1 guarded the fused whole-AMP Pallas kernel to single-chip runs, so
any section-sharded mesh silently fell back to the ~13x slower XLA scan.
This module composes the two:

- **Pure DP** (section axis absent or size 1): every device runs the
  unmodified whole-AMP mega-kernel on its local codeword batch under
  `shard_map` — all T iterations in VMEM, zero collectives until the
  error-counter psum at the end.

- **Section-sharded** (S > 1 shards of the L axis): per-iteration loop
  under `shard_map`.  Each device holds the (B_d, L/S, M) slab of the
  N-space state; per iteration:

    1. local transform: H_{L/S} (x) H_M on the slab — the Pallas tile
       kernel (ops.amp_kernel.fwht_tile_pallas), factored exactly like the
       single-chip kernel;
    2. cross-shard H_S: log2(S) hypercube butterfly stages via `ppermute`
       (same math as parallel.dist_fwht — H_L = H_S (x) H_{L/S} in
       Sylvester ordering with contiguous shards);
    3. residual + Onsager locally; tau2 = psum(||z||^2)/n;
    4. adjoint = same transform (self-adjoint); sectionwise softmax is
       fully local (sections are never split across shards);
    5. ||beta||^2 psum feeds the next Onsager term.

  Collectives per iteration: 2*log2(S) slab ppermutes + 2 scalar psums —
  exactly the boundary SURVEY.md §3.2 prescribes.  The whole-AMP-in-VMEM
  trick cannot survive S > 1 (the per-iteration collectives force state
  through HBM), so the sharded path's win over the XLA scan is the Pallas
  local transform + XLA-fused elementwise glue.

Supports the same tau2-schedule and decision-feedback pinning inputs as
the single-chip kernel, so the concat pipeline composes with sharding too.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.amp_kernel import amp_fused, fwht_tile_pallas
from ..ops.denoiser import denoise


def amp_fused_sharded(
    y_n: jax.Array,                  # (B, L, M) N-space embedded y
    mask: jax.Array,                 # (L, M) row-support 0/1
    sq_npl: jax.Array,               # (L,)
    P_pow: float, n: int, T: int,
    policy,                          # parallel.mesh.ShardingPolicy
    tau2_schedule: Optional[jax.Array] = None,   # (T,)
    pin_idx: Optional[jax.Array] = None,         # (B, L) int32, -1=off
    interpret: bool = False,
    fused_split: Optional[bool] = None,
    tol: float = 0.0,                # per-codeword early stop (amp_tol)
    encode_idx: Optional[jax.Array] = None,   # (B, L) int32, pure DP only
    noise_seed: Optional[jax.Array] = None,   # (B, 2) uint32, pure DP only
    noise_sigma: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused AMP under a ('data','section') mesh.

    Returns (beta (B, L, M) sharded P(data, section, None),
             tau2_trace (T, B) sharded P(None, data),
             iters (B,) sharded P(data)).

    tol > 0 gives the same per-codeword freeze semantics as the
    single-chip kernels (round-2 VERDICT missing #3: the multi-chip paths
    used to silently drop amp_tol and run fixed-T): pure DP passes tol to
    the in-kernel early stop; section-sharded applies the XLA-scan freeze
    mask (state is held once |tau2_t - tau2_{t-1}| < tol*tau2_t, and the
    mask cannot skip collectives, so it preserves semantics rather than
    wall time).  tol == 0 runs fixed-T and reports iters == T.
    """
    mesh = policy.mesh
    data_axis = policy.data_axis
    section_axis = policy.section_axis
    S = mesh.shape[section_axis] if section_axis is not None else 1
    if y_n is not None:
        B, L, M = y_n.shape
    else:
        # in-kernel noise: no y tensor exists; geometry from mask/idx
        B, L = noise_seed.shape[0], mask.shape[0]
        M = mask.shape[1]
    inv_sqrt_n = 1.0 / math.sqrt(n)
    has_sched = tau2_schedule is not None
    has_pin = pin_idx is not None
    assert tol == 0.0 or not has_sched, \
        "a tau2 schedule has no online estimate to compare against"
    mask = mask.astype(jnp.float32)

    has_enc = encode_idx is not None
    has_noise = noise_seed is not None
    assert not ((has_enc or has_noise) and S > 1), (
        "in-kernel encode/noise need each codeword's whole (L, M) state "
        "on one device; section-sharded callers encode in XLA")

    if S == 1:
        # pure DP: the unmodified mega-kernel per device.  In-kernel
        # encode composes trivially here (round-3 VERDICT missing #3):
        # each device gets its batch slice of the true-index tensor and
        # its kernel synthesizes x = A beta0 locally — y_n then carries
        # the embedded NOISE, exactly like the single-chip path.  With
        # in-kernel noise there is no y tensor at all: each device gets
        # its slice of the per-codeword PRNG seeds instead.
        def local_dp(*a):
            a = list(a)
            y_loc = None if has_noise else a.pop(0)
            sched = a.pop(0) if has_sched else None
            pin = a.pop(0) if has_pin else None
            enc = a.pop(0) if has_enc else None
            seed = a.pop(0) if has_noise else None
            sig = a.pop(0) if has_noise else None
            out = amp_fused(y_loc, mask, sq_npl, P_pow, n, T,
                            interpret=interpret, split=fused_split,
                            tau2_schedule=sched, pin_idx=pin, tol=tol,
                            encode_idx=enc, noise_seed=seed,
                            noise_sigma=sig)
            Bd = (y_loc if not has_noise else seed).shape[0]
            if tol:
                return out
            beta, trace = out
            return beta, trace, jnp.full((Bd,), T, jnp.int32)

        in_specs, args = [], []
        if not has_noise:
            in_specs.append(P(data_axis, None, None))
            args.append(y_n)
        if has_sched:
            in_specs.append(P())
            args.append(tau2_schedule)
        if has_pin:
            in_specs.append(P(data_axis, None))
            args.append(pin_idx)
        if has_enc:
            in_specs.append(P(data_axis, None))
            args.append(encode_idx)
        if has_noise:
            in_specs.append(P(data_axis, None))
            args.append(noise_seed)
            in_specs.append(P())
            args.append(jnp.asarray(noise_sigma, jnp.float32))
        # check_vma=False: pallas_call's out_shape carries no varying-mesh
        # annotation, so the vma checker cannot see through it.
        beta3, trace, iters = jax.shard_map(
            local_dp, mesh=mesh, in_specs=tuple(in_specs),
            out_specs=(P(data_axis, None, None), P(None, data_axis),
                       P(data_axis)),
            check_vma=False)(*args)
        return beta3, trace, iters

    assert L % S == 0 and (S & (S - 1)) == 0, (L, S)

    def transform(w, sidx):
        """Full H_L (x) H_M of the distributed tile: local Pallas tile
        transform, then the H_S factor as hypercube ppermute butterflies
        (one bidirectional ICI hop per stage)."""
        w = fwht_tile_pallas(w, scale=inv_sqrt_n, interpret=interpret)
        bit = 1
        while bit < S:
            perm = [(i, i ^ bit) for i in range(S)]
            recv = jax.lax.ppermute(w, section_axis, perm=perm)
            w = jnp.where((sidx & bit) != 0, recv - w, w + recv)
            bit <<= 1
        return w

    def local(y_slab, mask_slab, sq_slab, *opt):
        opt = list(opt)
        sched = opt.pop(0) if has_sched else None
        pin = opt.pop(0) if has_pin else None
        Bd, l, _ = y_slab.shape
        sidx = jax.lax.axis_index(section_axis)
        my = mask_slab[None] * y_slab          # loop-invariant mask*y

        def step(state, t):
            beta, z, tau2_prev, done, iters = state
            bnorm2 = jax.lax.psum(
                jnp.sum(beta * beta, axis=(1, 2)), section_axis)
            coef = (P_pow - bnorm2 / n) / tau2_prev       # 0 at t=0 (inf)
            w = transform(beta, sidx)
            z_new = my - mask_slab[None] * w + coef[:, None, None] * z
            if sched is None:
                tau2 = jax.lax.psum(
                    jnp.sum(z_new * z_new, axis=(1, 2)), section_axis) / n
            else:
                tau2 = jnp.full((Bd,), sched[t], dtype=jnp.float32)
            s = transform(z_new, sidx) + beta
            beta_new, _ = denoise(s, tau2, sq_slab)
            if pin is not None:
                # pin: (Bd, l) int32 local pin targets (-1 = unpinned);
                # synthesize sq*one_hot rows locally (sections are never
                # split across shards, so the override is shard-local)
                pv = jnp.where(pin[:, :, None] == jnp.arange(M)[None, None],
                               sq_slab[None, :, None], 0.0)
                beta_new = jnp.where((pin >= 0)[:, :, None], pv, beta_new)
            if tol == 0.0:
                return (beta_new, z_new, tau2, done, iters + 1), tau2
            # amp_tol freeze mask (models/amp.py scan semantics): `done`
            # is evaluated on the iteration that ran; the NEXT iteration
            # is the first frozen one, whose state/trace are held.  The
            # mask cannot skip the ppermute/psum collectives (every shard
            # must participate), so this preserves the single-chip
            # adaptive semantics without the wall-time win.
            conv = jnp.abs(tau2 - tau2_prev) < tol * tau2
            keep = done
            k3 = keep[:, None, None]
            return (
                jnp.where(k3, beta, beta_new),
                jnp.where(k3, z, z_new),
                jnp.where(keep, tau2_prev, tau2),
                keep | conv,
                iters + jnp.where(keep, 0, 1).astype(iters.dtype),
            ), jnp.where(keep, tau2_prev, tau2)

        beta0 = jnp.zeros((Bd, l, M), jnp.float32)
        z0 = jnp.zeros((Bd, l, M), jnp.float32)
        tau20 = jnp.full((Bd,), jnp.inf, jnp.float32)
        done0 = jnp.zeros((Bd,), bool)
        it0 = jnp.zeros((Bd,), jnp.int32)
        (beta, _, _, _, iters), trace = jax.lax.scan(
            step, (beta0, z0, tau20, done0, it0), jnp.arange(T))
        return beta, trace, iters

    in_specs = [P(data_axis, section_axis, None),
                P(section_axis, None), P(section_axis)]
    args = [y_n, mask, sq_npl]
    if has_sched:
        in_specs.append(P())
        args.append(tau2_schedule)
    if has_pin:
        in_specs.append(P(data_axis, section_axis))
        args.append(pin_idx)
    beta3, trace, iters = jax.shard_map(
        local, mesh=mesh, in_specs=tuple(in_specs),
        out_specs=(P(data_axis, section_axis, None),
                   P(None, data_axis), P(data_axis)),
        check_vma=False)(*args)
    return beta3, trace, iters
