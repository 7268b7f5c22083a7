"""M0 oracle tests (SURVEY.md §4.1-4.3): invariants + statistical checks."""

import numpy as np
import pytest

from sparc_ldpc_tpu.config import SparcConfig
from sparc_ldpc_tpu.design.power import power_allocation, flat_alloc
from sparc_ldpc_tpu.design.se import se_trajectory
from sparc_ldpc_tpu.oracle import sparc as osparc
from sparc_ldpc_tpu.oracle.fwht import fwht, fwht_np, has_native
from sparc_ldpc_tpu.utils.bits import np_bits_to_indices, np_indices_to_bits


# --------------------------------------------------------------------- bits

def test_bit_packing_roundtrip(rng):
    bits = rng.integers(0, 2, size=(3, 8 * 9))
    idx = np_bits_to_indices(bits, 9)
    assert idx.shape == (3, 8)
    assert np.all(idx < 512)
    back = np_indices_to_bits(idx, 9)
    assert np.array_equal(back, bits)


def test_bit_packing_msb_first():
    # index 1 -> bits 0...01; index M/2 -> 10...0
    bits = np_indices_to_bits(np.array([1, 256]), 9)
    assert bits[8] == 1 and bits[:8].sum() == 0
    assert bits[9] == 1 and bits[10:].sum() == 0


# --------------------------------------------------------------------- fwht

def test_fwht_matches_hadamard_matrix(rng):
    N = 64
    H = np.array([[1]])
    while H.shape[0] < N:
        H = np.block([[H, H], [H, -H]])
    x = rng.standard_normal((5, N))
    np.testing.assert_allclose(fwht_np(x), x @ H.T, atol=1e-9)


def test_fwht_self_inverse(rng):
    x = rng.standard_normal((4, 256))
    np.testing.assert_allclose(fwht_np(fwht_np(x)) / 256, x, atol=1e-9)


def test_fwht_native_matches_numpy(rng):
    assert has_native(), "native/libsparcfwht.so missing - run make -C native"
    x = rng.standard_normal((7, 1024))
    np.testing.assert_allclose(fwht(x), fwht_np(x), atol=1e-9)


# ---------------------------------------------------------------- operators

CFG_SMALL = SparcConfig(L=32, M=64, R=1.0, op_kind="dense", amp_iters=32)


@pytest.mark.parametrize("kind", ["dense", "hadamard", "dct"])
def test_adjointness(kind, rng):
    cfg = CFG_SMALL.replace(op_kind=kind)
    op = osparc.make_operator(cfg)
    for _ in range(3):
        beta = rng.standard_normal(cfg.ML)
        z = rng.standard_normal(cfg.n)
        lhs = float(op.Ax(beta) @ z)
        rhs = float(beta @ op.Ay(z))
        assert abs(lhs - rhs) < 1e-8 * max(1.0, abs(lhs))


@pytest.mark.parametrize("kind", ["hadamard", "dct"])
def test_codeword_power(kind, rng):
    cfg = SparcConfig(L=128, M=128, R=1.0, op_kind=kind)
    p = flat_alloc(cfg.L, cfg.P)
    op = osparc.make_operator(cfg)
    bits = rng.integers(0, 2, cfg.k_bits)
    x = osparc.encode(bits, cfg, p, op)
    assert x.shape == (cfg.n,)
    # E||x||^2/n == P; tolerance from random row subsets
    assert abs(x @ x / cfg.n - cfg.P) < 0.15 * cfg.P


# ---------------------------------------------------------------------- AMP

@pytest.mark.parametrize("kind", ["dense", "hadamard"])
def test_amp_decodes_at_high_snr(kind):
    cfg = CFG_SMALL.replace(op_kind=kind)
    out = osparc.run_trial(seed=0, cfg=cfg, ebno_db=8.0)
    assert out["bit_errors"] == 0
    assert out["frame_error"] == 0


def test_amp_tau_tracks_se():
    """tau2 trace within an SE band (SURVEY.md §4.3)."""
    cfg = SparcConfig(L=256, M=512, R=1.0, op_kind="hadamard", amp_iters=20,
                      amp_tol=0.0)
    ebno_db = 6.0
    sigma2 = cfg.sigma2(ebno_db)
    p = flat_alloc(cfg.L, cfg.P)
    se = se_trajectory(p, cfg.n, cfg.M, sigma2, T=20)
    out = osparc.run_trial(seed=1, cfg=cfg, ebno_db=ebno_db, p_alloc=p)
    tr = out["tau2_trace"]
    # Shift-tolerant band: SE is monotone decreasing, so allow the empirical
    # trace to lead/lag by one iteration through the waterfall region while
    # requiring a tight match pointwise elsewhere.
    T = min(len(tr), len(se))
    for t in range(T):
        lo = se[min(t + 1, len(se) - 1)] * 0.9
        hi = se[max(t - 1, 0)] * 1.1
        assert lo <= tr[t] <= hi, (t, tr[t], lo, hi)
    # final tau2 should approach sigma2 (successful decode regime)
    assert tr[-1] < 1.5 * sigma2


def test_amp_fails_above_capacity():
    # R far above capacity at low SNR must not decode (sanity of the metric)
    cfg = SparcConfig(L=64, M=64, R=2.5, op_kind="hadamard", amp_iters=16)
    out = osparc.run_trial(seed=0, cfg=cfg, ebno_db=0.0)
    assert out["section_errors"] > 0


# -------------------------------------------------------------------- power

def test_power_allocations_sum_to_P():
    cfg = SparcConfig(L=64, M=64, R=1.0)
    sigma2 = cfg.sigma2(2.0)
    for kind in ["flat", "exp", "iterative"]:
        p = power_allocation(kind, cfg.L, cfg.P, sigma2, cfg.n, cfg.M)
        assert p.shape == (cfg.L,)
        assert np.all(p >= 0)
        np.testing.assert_allclose(p.sum(), cfg.P, rtol=1e-12)


def test_se_monotone_decrease():
    cfg = SparcConfig(L=256, M=512, R=1.0)
    sigma2 = cfg.sigma2(4.0)
    p = flat_alloc(cfg.L, cfg.P)
    tr = se_trajectory(p, cfg.n, cfg.M, sigma2)
    assert np.all(np.diff(tr) <= 1e-9)
    assert tr[-1] < sigma2 * 1.2
