"""L1/L2 op tests: FWHT variants, operators, denoiser (SURVEY.md §4.2, §4.5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sparc_ldpc_tpu.config import SparcConfig
from sparc_ldpc_tpu.ops.fwht import (
    factorize_pow2, fwht_mxu, fwht_butterfly, fwht_pallas,
)
from sparc_ldpc_tpu.ops.operators import make_operator
from sparc_ldpc_tpu.ops.denoiser import denoise, denoise_pallas
from sparc_ldpc_tpu.oracle.fwht import fwht_np
from sparc_ldpc_tpu.oracle import sparc as osparc
from sparc_ldpc_tpu.design.power import flat_alloc


def test_factorize():
    assert factorize_pow2(1 << 21) == (128, 128, 128)
    assert factorize_pow2(1 << 19) == (128, 64, 64)
    assert factorize_pow2(1 << 22) == (256, 128, 128)
    assert factorize_pow2(2) == (2,)
    for k in range(1, 23):
        fs = factorize_pow2(1 << k)
        assert int(np.prod(fs)) == 1 << k


@pytest.mark.parametrize("N", [8, 64, 512, 4096, 1 << 15])
def test_fwht_mxu_matches_oracle(N, rng):
    x = rng.standard_normal((3, N)).astype(np.float32)
    want = fwht_np(x.astype(np.float64))
    got = np.asarray(fwht_mxu(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-3 * np.sqrt(N))
    got_b = np.asarray(fwht_butterfly(jnp.asarray(x)))
    np.testing.assert_allclose(got_b, want, rtol=2e-5, atol=2e-3 * np.sqrt(N))


def test_fwht_pallas_interpret_matches(rng):
    # 2^15 -> factors (32,32,32): exercises the fused 3-factor kernel path
    N = 1 << 15
    x = rng.standard_normal((2, N)).astype(np.float32)
    want = fwht_np(x.astype(np.float64))
    got = np.asarray(fwht_pallas(jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-3 * np.sqrt(N))


@pytest.mark.parametrize("kind", ["dense", "hadamard", "dct"])
def test_batched_operator_matches_oracle(kind, rng):
    cfg = SparcConfig(L=32, M=64, R=1.0, op_kind=kind)
    jop = make_operator(cfg)
    oop = osparc.make_operator(cfg)
    B = 3
    beta = rng.standard_normal((B, cfg.ML)).astype(np.float32)
    z = rng.standard_normal((B, cfg.n)).astype(np.float32)
    fwd_o = np.stack([oop.Ax(beta[b].astype(np.float64)) for b in range(B)])
    adj_o = np.stack([oop.Ay(z[b].astype(np.float64)) for b in range(B)])
    np.testing.assert_allclose(np.asarray(jop.Ax(jnp.asarray(beta))), fwd_o,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jop.Ay(jnp.asarray(z))), adj_o,
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("kind", ["hadamard", "dct"])
def test_batched_adjointness(kind, rng):
    cfg = SparcConfig(L=64, M=128, R=1.2, op_kind=kind)
    op = make_operator(cfg)
    beta = jnp.asarray(rng.standard_normal((2, cfg.ML)), dtype=jnp.float32)
    z = jnp.asarray(rng.standard_normal((2, cfg.n)), dtype=jnp.float32)
    lhs = jnp.sum(op.Ax(beta) * z, axis=-1)
    rhs = jnp.sum(beta * op.Ay(z), axis=-1)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                               rtol=2e-3, atol=1e-2)


def test_denoiser_matches_oracle(rng):
    L, M, n = 16, 32, 256
    p = flat_alloc(L, 1.0)
    s = rng.standard_normal((2, L, M))
    tau2 = np.array([0.5, 0.1])
    sq = np.sqrt(n * p)
    beta_j, post_j = denoise(jnp.asarray(s, dtype=jnp.float32),
                             jnp.asarray(tau2, dtype=jnp.float32),
                             jnp.asarray(sq, dtype=jnp.float32))
    for b in range(2):
        beta_o, post_o = osparc.denoise(s[b].reshape(-1), tau2[b], p, n, M)
        np.testing.assert_allclose(np.asarray(beta_j[b]).reshape(-1), beta_o,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(post_j[b]), post_o,
                                   rtol=1e-4, atol=1e-6)
    # softmax mass: sum_j beta = sqrt(n P_l) per section
    np.testing.assert_allclose(np.asarray(beta_j.sum(-1)),
                               np.tile(sq, (2, 1)), rtol=1e-5)


def test_denoiser_pallas_interpret_matches(rng):
    L, M = 32, 128
    s = jnp.asarray(rng.standard_normal((2, L, M)), dtype=jnp.float32)
    tau2 = jnp.asarray([0.7, 0.2], dtype=jnp.float32)
    sq = jnp.asarray(np.sqrt(100 * flat_alloc(L, 1.0)), dtype=jnp.float32)
    b1, p1 = denoise(s, tau2, sq)
    b2, p2 = denoise_pallas(s, tau2, sq, l_tile=16, interpret=True)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=1e-5, atol=1e-7)


def test_denoiser_extreme_tau_no_overflow():
    """SURVEY.md §7 hard-part 2: huge softmax arguments must not overflow."""
    L, M = 8, 16
    s = jnp.asarray(np.full((1, L, M), 50.0), dtype=jnp.float32)
    s = s.at[0, :, 3].set(1e4)
    tau2 = jnp.asarray([1e-6], dtype=jnp.float32)
    sq = jnp.full((L,), 30.0, dtype=jnp.float32)
    beta, post = denoise(s, tau2, sq)
    assert np.all(np.isfinite(np.asarray(beta)))
    np.testing.assert_allclose(np.asarray(post[0, :, 3]), 1.0, atol=1e-6)


def test_boxmuller_statistics():
    """In-kernel noise math (ops.amp_kernel.boxmuller_f32): uint32 bits ->
    standard normals.  Mean/variance/tail masses within CLT bands and the
    documented 5.9-sigma u1-floor truncation (round 4; the kernel feeds
    the same function pltpu.prng_random_bits tiles)."""
    import math

    from sparc_ldpc_tpu.ops.amp_kernel import boxmuller_f32

    rng = np.random.default_rng(7)
    bits = rng.integers(0, 1 << 32, size=(2, 512, 1024), dtype=np.uint32)
    z = np.asarray(boxmuller_f32(jnp.asarray(bits[0]), jnp.asarray(bits[1])))
    N = z.size
    assert abs(z.mean()) < 5.0 / np.sqrt(N)
    assert abs(z.var() - 1.0) < 0.01
    for t in (1.0, 2.0, 3.0):
        p = math.erfc(t / math.sqrt(2.0))
        phat = float(np.mean(np.abs(z) > t))
        se = math.sqrt(p * (1 - p) / N)
        assert abs(phat - p) < 5 * se, (t, phat, p)
    assert np.max(np.abs(z)) < 5.95


def test_noise_in_kernel_cpu_fallback_matches():
    """amp_noise_in_kernel needs a real TPU (no interpreter PRNG); on CPU
    backends the flag must fall back to the XLA noise draw and reproduce
    the flag-off counters bitwise (same nkeys, same draws)."""
    from sparc_ldpc_tpu.models.sparc import SparcModel
    from sparc_ldpc_tpu.utils import rng as rngu

    base = dict(L=64, M=64, R=1.0, op_kind="hadamard", amp_iters=8,
                amp_tol=0.0, transform_precision="bf16",
                amp_kernel="fused_split")
    tk = rngu.trial_keys(rngu.base_key(11), 8)
    outs = []
    for flag in (False, True):
        m = SparcModel.build(SparcConfig(**base, amp_noise_in_kernel=flag),
                             ebno_db=5.0)
        out = jax.jit(m.run_block)(tk)
        outs.append({k: int(v) for k, v in out.items()
                     if k in ("bit_errors", "frame_errors",
                              "section_errors", "iters_sum")})
    assert outs[0] == outs[1]


def test_boxmuller_pair_statistics():
    """Both Box-Muller outputs (the kernel's actual generation scheme):
    each output standard-normal, and the pair uncorrelated."""
    from sparc_ldpc_tpu.ops.amp_kernel import boxmuller_pair_f32

    rng = np.random.default_rng(13)
    bits = rng.integers(0, 1 << 32, size=(2, 512, 512), dtype=np.uint32)
    zc, zs = boxmuller_pair_f32(jnp.asarray(bits[0]), jnp.asarray(bits[1]))
    for z in (np.asarray(zc), np.asarray(zs)):
        N = z.size
        assert abs(z.mean()) < 5.0 / np.sqrt(N)
        assert abs(z.var() - 1.0) < 0.015
    corr = float(np.mean(np.asarray(zc) * np.asarray(zs)))
    assert abs(corr) < 5.0 / np.sqrt(zc.size)
