"""SPARC codec pipeline: encode -> channel -> AMP decode -> errors.

SURVEY.md §3.1/§3.2 and the L4->L5 contract
(`run_trial(rng, params) -> {bit_errors, frame_error, iters}`).

`SparcModel` bundles a config with its device constants (operator index
sets, power allocation) so the whole trial is one jittable, vmap-free
*batched* function: every stage is written over a leading codeword batch
axis, which is the 'data' mesh axis at scale (SURVEY.md §2 parallelism
breakdown: DP is the primary axis).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SparcConfig
from ..design.power import power_allocation
from ..design.se import se_trajectory
from ..utils import rng as rngu
from ..utils.bits import bits_to_indices, indices_to_bits
from ..ops.operators import BatchedOperator, make_operator
from .amp import AmpResult, amp_decode, hard_indices


@dataclass(frozen=True)
class SparcModel:
    """A SPARC codebook instantiated on device for one operating point.

    The power allocation depends on sigma2 for the SE-derived kinds, so a
    model is built per (config, ebno) pair; building is host-side and cheap
    relative to campaigns.
    """
    cfg: SparcConfig
    ebno_db: float
    sigma2: float
    p_alloc: np.ndarray                 # host copy (design-time truth)
    sq_npl: jax.Array                   # (L,) sqrt(n P_l) device constant
    op: BatchedOperator
    tau2_schedule: Optional[jax.Array]  # (T,) when cfg.tau_mode == "se"
    use_pallas: bool = False
    policy: object = None               # parallel.mesh.ShardingPolicy | None

    @staticmethod
    def build(cfg: SparcConfig, ebno_db: float,
              use_pallas: bool = False, policy=None) -> "SparcModel":
        sigma2 = cfg.sigma2(ebno_db)
        p = power_allocation(cfg.power_alloc, cfg.L, cfg.P, sigma2,
                             cfg.n, cfg.M, cfg.pa_a, cfg.pa_f)
        if cfg.amp_iters_auto:
            from dataclasses import replace
            from ..design.se import se_converged_iters
            t_se = se_converged_iters(p, cfg.n, cfg.M, sigma2,
                                      tol=cfg.amp_auto_tol,
                                      T_max=cfg.amp_iters,
                                      margin=cfg.amp_auto_margin)
            cfg = replace(cfg, amp_iters=t_se)
        sched = None
        if cfg.tau_mode == "se":
            tr = se_trajectory(p, cfg.n, cfg.M, sigma2, T=cfg.amp_iters)
            sched = jnp.asarray(
                np.pad(tr[1:], (0, max(0, cfg.amp_iters - len(tr) + 1)),
                       mode="edge")[: cfg.amp_iters], dtype=jnp.float32)
        return SparcModel(
            cfg=cfg, ebno_db=ebno_db, sigma2=sigma2, p_alloc=p,
            sq_npl=jnp.asarray(np.sqrt(cfg.n * p), dtype=jnp.float32),
            op=make_operator(cfg, use_pallas=use_pallas, policy=policy),
            tau2_schedule=sched, use_pallas=use_pallas, policy=policy)

    # ------------------------------------------------------------- encode

    def build_beta(self, indices: jax.Array,
                   sq_npl: Optional[jax.Array] = None) -> jax.Array:
        """(B, L) indices -> (B, ML) beta via one-hot scatter (App. A.1).

        sq_npl overrides the model constant so shared-compile sweeps can
        pass the per-point power allocation as a traced argument."""
        sq = self.sq_npl if sq_npl is None else sq_npl
        onehot = jax.nn.one_hot(indices, self.cfg.M, dtype=jnp.float32)
        beta = sq[None, :, None] * onehot
        return beta.reshape(indices.shape[0], self.cfg.ML)

    def encode(self, bits: jax.Array) -> jax.Array:
        """(B, k_bits) -> (B, n) codewords (SURVEY.md §3.1)."""
        idx = bits_to_indices(bits, self.cfg.logM)
        return self.op.Ax(self.build_beta(idx))

    def channel(self, x: jax.Array, key: jax.Array) -> jax.Array:
        noise = jax.random.normal(key, x.shape, dtype=x.dtype)
        return x + noise * math.sqrt(self.sigma2)

    # ------------------------------------------------------------- decode

    def decode(self, y: jax.Array, T: Optional[int] = None,
               sq_npl: Optional[jax.Array] = None,
               **amp_kw) -> AmpResult:
        return amp_decode(
            y, self.op, self.sq_npl if sq_npl is None else sq_npl,
            self.cfg.P, self.cfg.n,
            T=T or self.cfg.amp_iters, tol=self.cfg.amp_tol,
            tau2_schedule=self.tau2_schedule,
            use_pallas_denoiser=self.use_pallas, policy=self.policy,
            residual_space=self.cfg.amp_residual_space,
            fused=self.cfg.amp_kernel.startswith("fused"),
            fused_split=True if self.cfg.amp_kernel == "fused_split" else None,
            fused_form="slab" if self.cfg.amp_kernel == "fused_slab" else None,
            **amp_kw)

    def decode_bits(self, y: jax.Array) -> jax.Array:
        res = self.decode(y)
        return indices_to_bits(hard_indices(res.beta), self.cfg.logM)

    # -------------------------------------------------------------- trial

    def run_trials(self, key: jax.Array, batch: int) -> Dict[str, jax.Array]:
        """Full batched Monte-Carlo block: encode->channel->decode->count.

        Key discipline (App. A.8): per-trial keys are fold_in(block_key, i);
        message and noise keys are positional folds of the trial key, so
        results are independent of batch partitioning / sharding.
        """
        return self.run_block(rngu.trial_keys(key, batch))

    def run_block(self, tkeys: jax.Array) -> Dict[str, jax.Array]:
        """Same as run_trials but takes the (B,) per-trial key array —
        the campaign driver shards it over the 'data' mesh axis and jits
        this function (SURVEY.md §3.5)."""
        return self.run_block_params(tkeys, self.sq_npl,
                                     jnp.float32(math.sqrt(self.sigma2)))

    def run_block_params(self, tkeys: jax.Array, sq_npl: jax.Array,
                         sigma: jax.Array) -> Dict[str, jax.Array]:
        """run_block with the per-operating-point device parameters as
        ARGUMENTS instead of closure constants, so one jit compilation
        serves every Eb/N0 point of a sweep (see SparcSweep; only sq_npl
        and sigma vary across points for online-tau configs)."""
        batch = tkeys.shape[0]
        mkeys = jax.vmap(lambda k: jax.random.fold_in(k, 0))(tkeys)
        nkeys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(tkeys)
        bits = jax.vmap(
            lambda k: jax.random.bernoulli(k, 0.5, (self.cfg.k_bits,))
        )(mkeys).astype(jnp.int32)
        idx_true = bits_to_indices(bits, self.cfg.logM)
        fused = self.cfg.amp_kernel.startswith("fused")
        # In-kernel encode (ops/amp_kernel.py round 3): on the fused
        # single-device AND pure-DP-sharded paths the kernel synthesizes
        # x = A beta0 itself from idx_true, so the XLA side only
        # generates bits + noise — the (B, L, M) one-hot materialization
        # and the HBM-streaming encode FWHT (measured 24% of block wall
        # at the headline shapes) disappear.  Same math, same RNG draws;
        # x differs from the XLA encode only in bf16 rounding
        # association.  Section-sharded policies are the one exclusion
        # (a codeword's one-hot spans shards — round-3 VERDICT
        # missing #3 closed for every other mesh policy).
        in_kernel_enc = (fused and self.cfg.amp_encode_in_kernel
                         and (self.policy is None
                              or self.policy.section_shards == 1)
                         and self.op.mask is not None
                         and self.cfg.L <= 4096 and self.cfg.M <= 1024)
        # In-kernel noise (round 4, amp_noise_in_kernel): the kernel draws
        # the masked AWGN itself from per-codeword pltpu PRNG seeds, so
        # the XLA side generates NOTHING per trial beyond the message bits
        # — the (B, n) normal draw and the (B, L, M) N-space embed (14.7%
        # of headline block wall, scripts/noise_probe.py) disappear.
        # Split form only; needs a real TPU (no interpreter PRNG).
        # Distribution-identical but a different stream than jax.random —
        # decisions are statistically, not bitwise, comparable across the
        # two noise routes (TPU BER A/B in docs/PERF.md round 4).
        in_kernel_noise = (
            in_kernel_enc and self.cfg.amp_noise_in_kernel
            and (self.cfg.amp_kernel == "fused_split"
                 or (self.cfg.amp_kernel == "fused" and self.cfg.L > 1024))
            and jax.default_backend() != "cpu")
        noise_kw = {}
        if in_kernel_noise:
            # same per-trial fold position as the XLA noise key (1); the
            # two threefry words become the pltpu PRNG seed
            seeds = jax.vmap(jax.random.key_data)(nkeys).reshape(batch, 2)
            y = None
            enc_idx = idx_true
            noise_kw = dict(noise_seed=seeds, noise_sigma=sigma)
        elif in_kernel_enc:
            noise = jax.vmap(
                lambda k: jax.random.normal(k, (self.cfg.n,),
                                            dtype=jnp.float32))(nkeys)
            y = noise * sigma
            enc_idx = idx_true
        else:
            noise = jax.vmap(
                lambda k: jax.random.normal(k, (self.cfg.n,),
                                            dtype=jnp.float32))(nkeys)
            onehot = jax.nn.one_hot(idx_true, self.cfg.M,
                                    dtype=jnp.float32)
            beta = (sq_npl[None, :, None] * onehot).reshape(
                batch, self.cfg.ML)
            y = self.op.Ax(beta) + noise * sigma
            enc_idx = None
        res = amp_decode(
            y, self.op, sq_npl, self.cfg.P, self.cfg.n,
            T=self.cfg.amp_iters, tol=self.cfg.amp_tol,
            tau2_schedule=self.tau2_schedule,
            use_pallas_denoiser=self.use_pallas, policy=self.policy,
            residual_space=self.cfg.amp_residual_space,
            fused=fused,
            fused_split=True if self.cfg.amp_kernel == "fused_split" else None,
            fused_form="slab" if self.cfg.amp_kernel == "fused_slab" else None,
            encode_idx=enc_idx, **noise_kw)
        idx_hat = hard_indices(res.beta)
        bits_hat = indices_to_bits(idx_hat, self.cfg.logM)
        bit_errors = jnp.sum(bits != bits_hat, axis=-1)         # (B,)
        section_errors = jnp.sum(idx_true != idx_hat, axis=-1)  # (B,)
        return dict(
            bit_errors=jnp.sum(bit_errors),
            # sum of squared per-frame bit errors: bit errors cluster within
            # frames, so honest BER confidence intervals need the
            # frame-level second moment, not a bit-level binomial
            # (scripts/ber_parity.py)
            bit_errors_sq=jnp.sum(bit_errors.astype(jnp.float32) ** 2),
            frame_errors=jnp.sum(bit_errors > 0),
            section_errors=jnp.sum(section_errors),
            trials=jnp.asarray(batch, dtype=jnp.int32),
            iters_sum=jnp.sum(res.iters),
            tau2_final=jnp.mean(res.tau2_trace[-1]),
        )


class SparcSweep:
    """Shared-compile sweep helper: one jitted block function reused across
    every Eb/N0 point (the per-point sq_npl / sigma are arguments, not
    closure constants — compiles once instead of once per point).

    Only valid for online-tau configs (an SE tau schedule is itself
    point-dependent and static-shaped; those fall back to per-point jits).
    """

    def __init__(self, cfg: SparcConfig, use_pallas: bool = False,
                 policy=None):
        self.cfg = cfg
        self.use_pallas = use_pallas
        self.policy = policy
        # jit cache keyed by the effective iteration count: amp_iters_auto
        # gives each point its own SE-derived T (a static shape), so points
        # share compilations per distinct T instead of one global jit.
        self._jitted = {}

    class _Point:
        def __init__(self, sweep, model):
            self._sweep = sweep
            self.model = model
            self.cfg = model.cfg

        def run_block(self, tkeys):
            return self._sweep._jitted[self.cfg.amp_iters](
                tkeys, self.model.sq_npl,
                jnp.float32(math.sqrt(self.model.sigma2)))
        run_block._prejitted = True  # campaign must not re-jit

    def model_for_point(self, ebno_db: float) -> "SparcSweep._Point":
        model = SparcModel.build(self.cfg, ebno_db,
                                 use_pallas=self.use_pallas,
                                 policy=self.policy)
        if self.cfg.tau_mode != "online":
            return model          # point-specific schedule: per-point jit
        t_eff = model.cfg.amp_iters
        if t_eff not in self._jitted:
            self._jitted[t_eff] = jax.jit(model.run_block_params)
        return SparcSweep._Point(self, model)
