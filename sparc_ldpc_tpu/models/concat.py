"""Concatenated SPARC + LDPC pipeline (SURVEY.md §3.3, App. A.7).

Section partition: the first Lu sections are unprotected; the last Lp carry
LDPC codeword bits (num_cw codewords back to back).  Lp is derived from the
requested protected fraction so that num_cw * ldpc.n is a whole number of
sections (num_cw * n ≡ 0 mod logM) — sections stay shard-aligned with the
LDPC partition (SURVEY.md §3.3 boundary note).

Decode chain:
  1. full AMP -> final beta (= sq_npl * section posteriors);
  2. bitwise LLRs over protected sections by pair-fold sums over beta
     (the per-section scale cancels; the (B, L, M) log-scores tensor of
     the round-1..4 chain never needs to exist — _protected_llrs_from_beta);
  3. flooding BP (ops.bp);
  4. harden -> protected section indices;
  5. decision feedback: re-run AMP with protected sections *pinned* to
     their hardened one-hots in the denoiser (soft-output pass);
  6. final argmax for unprotected sections from the feedback pass.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ConcatConfig
from ..utils import rng as rngu
from ..utils.bits import bits_to_indices, indices_to_bits
from .amp import hard_indices
from .ldpc import LdpcModel
from .sparc import SparcModel


def _derive_partition(L: int, logM: int, ldpc_n: int, f_prot: float
                      ) -> Tuple[int, int, int]:
    """(Lu, Lp, num_cw) with num_cw*ldpc_n == Lp*logM exactly."""
    target_bits = int(round(f_prot * L)) * logM
    num_cw = target_bits // ldpc_n
    while num_cw > 0 and (num_cw * ldpc_n) % logM != 0:
        num_cw -= 1
    if num_cw == 0:
        raise ValueError(
            f"cannot fit an LDPC codeword (n={ldpc_n}) into "
            f"{target_bits} protected bits with logM={logM}")
    Lp = (num_cw * ldpc_n) // logM
    return L - Lp, Lp, num_cw


@dataclass(frozen=True)
class ConcatModel:
    """SPARC inner code + LDPC outer code at one operating point."""
    cfg: ConcatConfig
    sparc: SparcModel
    ldpc: LdpcModel
    Lu: int                  # unprotected sections
    Lp: int                  # protected sections
    num_cw: int              # LDPC codewords per SPARC frame
    # lazy per-stage jit cache (mutable holder inside a frozen dataclass)
    _jits: dict = field(default_factory=dict)

    @staticmethod
    def build(cfg: ConcatConfig, ebno_db: float,
              use_pallas: bool = False, policy=None) -> "ConcatModel":
        sparc = SparcModel.build(cfg.sparc, ebno_db, use_pallas=use_pallas,
                                 policy=policy)
        ldpc = LdpcModel.build(cfg.ldpc)
        Lu, Lp, num_cw = _derive_partition(
            cfg.sparc.L, cfg.sparc.logM, ldpc.n, cfg.f_prot)
        return ConcatModel(cfg=cfg, sparc=sparc, ldpc=ldpc, Lu=Lu, Lp=Lp,
                           num_cw=num_cw)

    @property
    def k_user(self) -> int:
        """User payload bits per frame (unprotected + LDPC messages)."""
        return self.Lu * self.cfg.sparc.logM + self.num_cw * self.ldpc.k

    @property
    def overall_rate(self) -> float:
        return self.k_user / self.sparc.cfg.n

    # ------------------------------------------------------------- encode

    def encode(self, user_bits: jax.Array,
               sq_npl: Optional[jax.Array] = None) -> jax.Array:
        """(B, k_user) -> (B, n) channel codewords.

        sq_npl overrides the power-allocation constant (shared-compile
        sweeps pass it as a traced argument — see ConcatSweep)."""
        idx = self._true_indices(user_bits)
        return self.sparc.op.Ax(self.sparc.build_beta(idx, sq_npl))

    def _true_indices(self, user_bits: jax.Array,
                      ) -> jax.Array:
        """(B, k_user) -> (B, L) per-section true indices: THE single copy
        of the bit-assembly chain (unprot split -> LDPC encode -> concat ->
        bits_to_indices) shared by encode() and the in-kernel-encode trial
        paths, so the two framings cannot diverge."""
        B = user_bits.shape[0]
        logM = self.cfg.sparc.logM
        nu = self.Lu * logM
        unprot = user_bits[:, :nu]
        msgs = user_bits[:, nu:].reshape(B * self.num_cw, self.ldpc.k)
        cw = self.ldpc.encode(msgs).reshape(B, self.num_cw * self.ldpc.n)
        return bits_to_indices(jnp.concatenate([unprot, cw], axis=1), logM)

    # ------------------------------------------------------------- decode

    @property
    def _enc_in_kernel(self) -> bool:
        """In-kernel encode eligibility for the SELF-GENERATED trial paths
        (run_block*/_stage_gen): the inner SPARC kernel synthesizes
        x = A beta itself from the true section indices, so the staged
        pipeline carries the embedded NOISE as `y` and re-synthesizes the
        signal again in the pinned feedback pass (same true indices =>
        identical y, one extra in-kernel transform).  The public
        decode(y) API is untouched — it receives a real observation.
        Mirrors SparcModel.run_block_params (docs/PERF.md round 3);
        eligible under pure-DP mesh policies too (round-3 VERDICT
        missing #3), excluded only when sections are sharded."""
        c = self.cfg.sparc
        return (c.amp_kernel.startswith("fused") and c.amp_encode_in_kernel
                and (self.sparc.policy is None
                     or self.sparc.policy.section_shards == 1)
                and self.sparc.op.mask is not None
                and c.L <= 4096 and c.M <= 1024)

    @property
    def _noise_in_kernel(self) -> bool:
        """In-kernel AWGN for the self-generated trial paths (round 4):
        instead of carrying the explicit noise vector between the staged
        jits, the per-codeword PRNG SEEDS flow through — the inner AMP
        kernel synthesizes mask o AWGN itself, and the pinned feedback
        kernel re-synthesizes the identical noise from the same seeds
        (the pltpu PRNG is deterministic per seed), just like it already
        re-synthesizes the signal from the same true indices.  Same
        gate as SparcModel.run_block_params: split form, real TPU."""
        import jax as _jax

        c = self.cfg.sparc
        return (self._enc_in_kernel and c.amp_noise_in_kernel
                and (c.amp_kernel == "fused_split"
                     or (c.amp_kernel == "fused" and c.L > 1024))
                and _jax.default_backend() != "cpu")

    def _protected_llrs(self, scores: jax.Array) -> jax.Array:
        """Log-posterior scores -> bitwise LLRs for protected sections.

        a_{l,j} = log p_{l,j} (any per-section shift cancels in the lse
        difference); llr_b = lse_{j: bit_b(j)=0} a - lse_{j: bit_b(j)=1} a.
        Returns (B, Lp*logM).

        Exp-once form (round 5): the straightforward masked double
        logsumexp exponentiates two where-filled (B, Lp, logM, M) tensors
        — 2*logM*M transcendentals per section, and the measured s2a cost
        was ~7-8% of the shipped concat block (docs/PERF.md round-5 stage
        budget).  But every bit-set sum is a sum over e = exp(a - amax)
        computed ONCE: bit k (LSB) partitions the index axis into
        even/odd pairs, and folding pairs level by level yields all logM
        (s0, s1) masked-sum pairs in ~3M adds total — no masked fills,
        M exps instead of 2*logM*M.  Both sums are direct (never
        total - s1), so there is no cancellation; values differ from the
        lse form only by f32 reassociation (verified ~1e-6 abs against
        both the lse form and a float64 ground truth).  Bit b of the
        MSB-first convention (utils/bits.py) is LSB level logM-1-b.
        The shipped trial paths go one step further and fold the AMP
        beta directly (_protected_llrs_from_beta — the parity artifacts
        are anchored on that route); this scores form remains for the
        public decode-from-scores surface and comparison tooling.
        """
        a = scores[:, self.Lu:, :]                            # (B, Lp, M)
        amax = jnp.max(a, axis=-1, keepdims=True)
        return self._llr_fold(jnp.exp(a - amax))

    def _llr_fold(self, w: jax.Array) -> jax.Array:
        """(B, Lp, M) nonnegative section weights -> (B, Lp*logM) LLRs.

        llr_b = log sum_{bit_b(j)=0} w_j - log sum_{bit_b(j)=1} w_j —
        any per-section scale (softmax normalizer, the sq_npl amplitude
        in beta) cancels in the difference, so the fold accepts
        exp-shifted posteriors AND raw beta rows alike.  Sums are
        floored at f32 tiny before the log: inert for the exp form
        (every term >= exp(log tiny) is normal), and for the beta form
        it reproduces the XLA score path's effective ~87-nat clip when
        a whole bit-set's mass flushed to zero in the kernel (TPUs
        flush f32 subnormals) — far beyond the BP llr_clip either way.
        """
        B = w.shape[0]
        logM = self.cfg.sparc.logM
        s0 = [None] * logM
        s1 = [None] * logM
        cur = w
        for k in range(logM):                                 # fold LSB up
            cur = cur.reshape(B, self.Lp, -1, 2)
            p0, p1 = cur[..., 0], cur[..., 1]
            s0[logM - 1 - k] = jnp.sum(p0, axis=-1)
            s1[logM - 1 - k] = jnp.sum(p1, axis=-1)
            cur = p0 + p1
        tiny = jnp.finfo(jnp.float32).tiny
        llr = (jnp.log(jnp.maximum(jnp.stack(s0, axis=-1), tiny))
               - jnp.log(jnp.maximum(jnp.stack(s1, axis=-1), tiny)))
        return llr.reshape(B, self.Lp * logM)

    def _protected_llrs_from_beta(self, beta: jax.Array) -> jax.Array:
        """(B, L, M) final AMP beta -> (B, Lp*logM) LLRs, directly.

        beta_l = sq_npl[l] * posterior_l and the scale cancels in the
        fold, so the whole scores tensor (a (B, L, M) log over the
        posterior floor) never needs to exist: the shipped trial paths
        hand the kernel's beta straight to the fold.  Measured (stage
        budget r5f): drops the s1-side log/div+scores materialization
        AND the s2-side exp — the extraction is pure streaming adds.
        """
        return self._llr_fold(beta[:, self.Lu:, :])

    def _bp_from_scores(self, scores: jax.Array):
        """(2)-(4): scores -> hardened codeword bits + per-cw ok flags."""
        return self._bp_from_llr(self._protected_llrs(scores))

    def _bp_from_beta(self, beta: jax.Array):
        """(2)-(4) from the AMP beta directly (the shipped trial paths):
        skips the (B, L, M) scores tensor entirely — see
        _protected_llrs_from_beta."""
        return self._bp_from_llr(self._protected_llrs_from_beta(beta))

    def _bp_from_llr(self, llr: jax.Array):
        B = llr.shape[0]
        llr = llr.reshape(B * self.num_cw, self.ldpc.n)
        bp = self.ldpc.decode(llr)
        # BP that fails the syndrome check can be *worse* than the channel
        # (min-sum diverges on garbage LLRs); fall back to the channel hard
        # decision per codeword in that case.
        chan_hard = (llr < 0).astype(jnp.uint8)
        cw_bits = jnp.where(bp.ok[:, None], bp.hard, chan_hard)
        cw_hat = cw_bits.reshape(B, self.num_cw * self.ldpc.n)
        return cw_hat, bp.ok.reshape(B, self.num_cw), bp.iters.reshape(B, -1)

    def _feedback_user_bits(self, y: Optional[jax.Array], cw_hat: jax.Array,
                            ok: jax.Array,
                            sq_npl: Optional[jax.Array] = None,
                            enc_idx: Optional[jax.Array] = None,
                            noise_kw: Optional[dict] = None
                            ) -> jax.Array:
        """(5)-(6): gated pinned re-AMP -> assembled user bits (B, k_user).

        Only sections whose bits all come from syndrome-verified codewords
        are pinned: pinning a wrongly-decoded codeword poisons the AMP
        re-pass (observed: 27% vs 8% unprotected BER), while gating on
        bp.ok makes failed frames fall back to plain-AMP quality and
        decoded frames typically become error-free.
        """
        B = cw_hat.shape[0]
        logM = self.cfg.sparc.logM
        prot_idx = bits_to_indices(cw_hat, logM)              # (B, Lp)
        bit_ok = jnp.repeat(ok, self.ldpc.n, axis=1)          # (B, Lp*logM)
        sec_ok = jnp.all(bit_ok.reshape(B, self.Lp, logM), axis=-1)
        pin_mask = jnp.concatenate(
            [jnp.zeros((B, self.Lu), bool), sec_ok], axis=1)
        full_idx = jnp.concatenate(
            [jnp.zeros((B, self.Lu), jnp.int32), prot_idx], axis=1)
        # pin targets travel as indices; the fused kernels synthesize the
        # one-hot rows in VMEM and the XLA route builds them at apply_pin
        # (round 5 — bitwise-identical, no (B, L, M) materialization here)
        res2 = self.sparc.decode(
            y, T=self.cfg.feedback_iters, sq_npl=sq_npl,
            pinned_idx=full_idx, pinned_mask=pin_mask,
            encode_idx=enc_idx, **(noise_kw or {}))
        unprot_idx = hard_indices(res2.beta)[:, : self.Lu]
        unprot_bits = indices_to_bits(unprot_idx, logM)
        msg_bits = self.ldpc.extract_message(
            cw_hat.reshape(B * self.num_cw, self.ldpc.n)
        ).reshape(B, self.num_cw * self.ldpc.k)
        return jnp.concatenate([unprot_bits, msg_bits], axis=1)

    def decode(self, y: jax.Array) -> Dict[str, jax.Array]:
        """Full concatenated decode; returns user bits + diagnostics."""
        res = self.sparc.decode(y)
        cw_hat, ok, bp_iters = self._bp_from_beta(res.beta)
        user_hat = self._feedback_user_bits(y, cw_hat, ok)
        return dict(user_bits=user_hat, bp_ok=ok,
                    amp_iters=res.iters, bp_iters=bp_iters,
                    tau2_final=res.tau2_trace[-1])

    # -------------------------------------------------------------- trial

    def run_trials(self, key: jax.Array, batch: int) -> Dict[str, jax.Array]:
        """Batched end-to-end Monte-Carlo block (SURVEY.md §3.5 inner body)."""
        return self.run_block(rngu.trial_keys(key, batch))

    # ---------------------------------------------------- staged execution
    #
    # One monolithic jit of the full chain (inner AMP scan + BP scan +
    # feedback AMP scan) blows up remote-compile time on the axon toolchain
    # (>29 min observed, and one compile-helper SIGSEGV).  The staged runner
    # compiles three bounded programs instead — each is individually a
    # known-fast compile — and keeps all intermediates on device.

    def _stage_gen_amp(self, tkeys: jax.Array):
        return self._stage_gen_amp_params(
            tkeys, self.sparc.sq_npl,
            jnp.float32(math.sqrt(self.sparc.sigma2)))

    def _stage_gen_amp_params(self, tkeys: jax.Array, sq_npl: jax.Array,
                              sigma: jax.Array):
        """Stage 1 with the per-operating-point device parameters as
        ARGUMENTS (sq_npl, sigma) instead of closure constants, so one jit
        serves every Eb/N0 point of a sweep (ConcatSweep; mirrors
        SparcModel.run_block_params)."""
        mkeys = jax.vmap(lambda k: jax.random.fold_in(k, 0))(tkeys)
        nkeys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(tkeys)
        bits = jax.vmap(
            lambda k: jax.random.bernoulli(k, 0.5, (self.k_user,))
        )(mkeys).astype(jnp.int32)
        if self._noise_in_kernel:
            # the `y` slot carries the per-codeword PRNG SEEDS: both the
            # inner kernel here and the stage-3 feedback kernel
            # synthesize the identical masked AWGN from them (plus the
            # signal from the true indices) — no noise vector exists
            # outside the kernels at all
            idx = self._true_indices(bits)
            y = jax.vmap(jax.random.key_data)(nkeys).reshape(
                bits.shape[0], 2)
            res = self.sparc.decode(None, sq_npl=sq_npl, encode_idx=idx,
                                    noise_seed=y, noise_sigma=sigma)
        elif self._enc_in_kernel:
            # y carries the NOISE; the kernel adds mask o (A beta0)
            # itself (and again in the stage-3 feedback pass)
            idx = self._true_indices(bits)
            noise = jax.vmap(
                lambda k: jax.random.normal(k, (self.sparc.cfg.n,),
                                            dtype=jnp.float32))(nkeys)
            y = noise * sigma
            res = self.sparc.decode(y, sq_npl=sq_npl, encode_idx=idx)
        else:
            idx = jnp.zeros((bits.shape[0], self.cfg.sparc.L), jnp.int32)
            noise = jax.vmap(
                lambda k: jax.random.normal(k, (self.sparc.cfg.n,),
                                            dtype=jnp.float32))(nkeys)
            y = self.encode(bits, sq_npl) + noise * sigma
            res = self.sparc.decode(y, sq_npl=sq_npl)
        return bits, y, res.beta, res.iters, idx

    def _stage_finish(self, y, cw_hat, ok, bits, amp_iters, enc_idx):
        return self._stage_finish_params(
            y, cw_hat, ok, bits, amp_iters, enc_idx, self.sparc.sq_npl,
            jnp.float32(math.sqrt(self.sparc.sigma2)))

    def _stage_finish_params(self, y, cw_hat, ok, bits, amp_iters, enc_idx,
                             sq_npl, sigma):
        if self._noise_in_kernel:
            # `y` holds the PRNG seeds (see _stage_gen_amp_params); the
            # feedback kernel re-synthesizes the identical noise
            y_obs, nkw = None, dict(noise_seed=y, noise_sigma=sigma)
        else:
            y_obs, nkw = y, None
        user_hat = self._feedback_user_bits(
            y_obs, cw_hat, ok, sq_npl,
            enc_idx=enc_idx if self._enc_in_kernel else None,
            noise_kw=nkw)
        bit_errors = jnp.sum(bits != user_hat, axis=-1)
        return dict(
            bit_errors=jnp.sum(bit_errors),
            # frame-level second moment for cluster-robust BER CIs
            # (scripts/ber_parity.py; campaign journals carry it too)
            bit_errors_sq=jnp.sum(bit_errors.astype(jnp.float32) ** 2),
            frame_errors=jnp.sum(bit_errors > 0),
            trials=jnp.asarray(bits.shape[0], dtype=jnp.int32),
            bp_ok=jnp.sum(ok),
            iters_sum=jnp.sum(amp_iters),
        )

    def _jit(self, name, fn):
        if name not in self._jits:
            self._jits[name] = jax.jit(fn)
        return self._jits[name]

    def run_block_staged(self, tkeys: jax.Array) -> Dict[str, jax.Array]:
        """Three bounded jits instead of one monolith (see note above)."""
        bits, y, beta, iters, idx = self._jit(
            "s1", self._stage_gen_amp)(tkeys)
        cw_hat, ok, _ = self._jit("s2", self._bp_from_beta)(beta)
        return self._jit("s3", self._stage_finish)(y, cw_hat, ok, bits,
                                                   iters, idx)
    run_block_staged._prejitted = True   # campaign must not wrap in jit

    def run_block(self, tkeys: jax.Array) -> Dict[str, jax.Array]:
        batch = tkeys.shape[0]
        mkeys = jax.vmap(lambda k: jax.random.fold_in(k, 0))(tkeys)
        nkeys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(tkeys)
        bits = jax.vmap(
            lambda k: jax.random.bernoulli(k, 0.5, (self.k_user,))
        )(mkeys).astype(jnp.int32)
        sigma = math.sqrt(self.sparc.sigma2)
        if self._noise_in_kernel:
            idx = self._true_indices(bits)
            seeds = jax.vmap(jax.random.key_data)(nkeys).reshape(batch, 2)
            nkw = dict(noise_seed=seeds, noise_sigma=jnp.float32(sigma))
            res = self.sparc.decode(None, encode_idx=idx, **nkw)
            cw_hat, ok, bp_iters = self._bp_from_beta(res.beta)
            user_hat = self._feedback_user_bits(None, cw_hat, ok,
                                                enc_idx=idx, noise_kw=nkw)
            out = dict(user_bits=user_hat, bp_ok=ok,
                       amp_iters=res.iters, bp_iters=bp_iters,
                       tau2_final=res.tau2_trace[-1])
        elif self._enc_in_kernel:
            idx = self._true_indices(bits)
            noise = jax.vmap(
                lambda k: jax.random.normal(k, (self.sparc.cfg.n,),
                                            dtype=jnp.float32))(nkeys)
            y = noise * sigma
            res = self.sparc.decode(y, encode_idx=idx)
            cw_hat, ok, bp_iters = self._bp_from_beta(res.beta)
            user_hat = self._feedback_user_bits(y, cw_hat, ok,
                                                enc_idx=idx)
            out = dict(user_bits=user_hat, bp_ok=ok,
                       amp_iters=res.iters, bp_iters=bp_iters,
                       tau2_final=res.tau2_trace[-1])
        else:
            noise = jax.vmap(
                lambda k: jax.random.normal(k, (self.sparc.cfg.n,),
                                            dtype=jnp.float32))(nkeys)
            y = self.encode(bits) + noise * sigma
            out = self.decode(y)
        bit_errors = jnp.sum(bits != out["user_bits"], axis=-1)
        return dict(
            bit_errors=jnp.sum(bit_errors),
            bit_errors_sq=jnp.sum(bit_errors.astype(jnp.float32) ** 2),
            frame_errors=jnp.sum(bit_errors > 0),
            trials=jnp.asarray(batch, dtype=jnp.int32),
            bp_ok=jnp.sum(out["bp_ok"]),
            iters_sum=jnp.sum(out["amp_iters"]),
        )


class ConcatSweep:
    """Shared-compile sweep helper for the concat chain (round-2 VERDICT
    missing #4; mirrors SparcSweep for ConcatModel).

    ConcatModel.run_block_staged rebuilds its three staged jits per Eb/N0
    point; with remote-relay compiles measured at 8 s-5 min (docs/PERF.md)
    a multi-point concat campaign was compile-dominated.  Here the
    per-point device parameters (sq_npl, sigma) are ARGUMENTS to the
    staged functions, so each stage compiles once per distinct effective
    iteration count instead of once per point:

      s1 (gen+encode+inner AMP)  keyed by T_eff (amp_iters_auto can give
                                 each point its own static T)
      s2 (LLR extract + BP)      point-independent, one compile total
      s3 (feedback AMP + count)  point-independent, one compile total

    Only valid for online-tau configs (an SE tau schedule is itself
    point-dependent and static-shaped); those fall back to per-point
    models, exactly like SparcSweep.
    """

    def __init__(self, cfg: ConcatConfig, use_pallas: bool = False,
                 policy=None):
        self.cfg = cfg
        self.use_pallas = use_pallas
        self.policy = policy
        self._jits: dict = {}

    def _jit(self, key, fn):
        if key not in self._jits:
            self._jits[key] = jax.jit(fn)
        return self._jits[key]

    class _Point:
        def __init__(self, sweep: "ConcatSweep", model: ConcatModel):
            self._sweep = sweep
            self.model = model
            self.cfg = model.cfg

        @property
        def k_user(self) -> int:
            return self.model.k_user

        def run_block_staged(self, tkeys):
            m = self.model
            sw = self._sweep
            sq = m.sparc.sq_npl
            sigma = jnp.float32(math.sqrt(m.sparc.sigma2))
            # the cached jits are bound to the FIRST point's model; every
            # closure constant other than (sq_npl, sigma) — operator index
            # sets, LDPC arrays, partition, P, n — is point-independent by
            # construction (seeds derive from the config, not ebno)
            t_eff = m.sparc.cfg.amp_iters
            s1 = sw._jit(("s1", t_eff), m._stage_gen_amp_params)
            bits, y, beta, iters, idx = s1(tkeys, sq, sigma)
            s2 = sw._jit("s2", m._bp_from_beta)
            cw_hat, ok, _ = s2(beta)
            s3 = sw._jit("s3", m._stage_finish_params)
            return s3(y, cw_hat, ok, bits, iters, idx, sq, sigma)
        run_block_staged._prejitted = True   # campaign must not re-jit

    def model_for_point(self, ebno_db: float) -> object:
        model = ConcatModel.build(self.cfg, ebno_db,
                                  use_pallas=self.use_pallas,
                                  policy=self.policy)
        if model.sparc.cfg.tau_mode != "online":
            return model          # point-specific schedule: per-point jits
        return ConcatSweep._Point(self, model)
