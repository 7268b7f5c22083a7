"""M3: SE-derived design features (SURVEY.md §7 M3, App. A.2/A.5)."""

import json
import subprocess
import sys

import numpy as np
import pytest

import jax

from sparc_ldpc_tpu.config import SparcConfig
from sparc_ldpc_tpu.design.power import (
    exp_alloc, iterative_alloc, modified_alloc, optimize_modified,
)
from sparc_ldpc_tpu.design.se import se_trajectory
from sparc_ldpc_tpu.models.sparc import SparcModel


def test_exp_alloc_shape():
    p = exp_alloc(64, 1.0, 0.25)
    assert p[0] > p[-1] > 0
    np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-12)
    # successive ratio constant: 2^{-2C/L}
    ratios = p[1:] / p[:-1]
    np.testing.assert_allclose(ratios, ratios[0], rtol=1e-9)


def test_modified_alloc_flattens_tail():
    p = modified_alloc(64, 1.0, 0.25, a=0.8, f=0.5)
    np.testing.assert_allclose(p[32:], p[32], rtol=1e-12)
    assert p[0] > p[31] > p[32] > 0


def test_iterative_beats_flat_threshold():
    """SE: iterative PA decodes at a point where flat stalls (App. A.2)."""
    cfg = SparcConfig(L=256, M=512, R=1.0)
    sigma2 = cfg.sigma2(2.0)
    flat = np.full(cfg.L, cfg.P / cfg.L)
    tr_flat = se_trajectory(flat, cfg.n, cfg.M, sigma2, n_samples=1024)
    p_it = iterative_alloc(cfg.L, cfg.P, sigma2, cfg.n, cfg.M,
                           n_samples=1024)
    tr_it = se_trajectory(p_it, cfg.n, cfg.M, sigma2, n_samples=1024)
    assert tr_flat[-1] > 2.0 * sigma2        # flat stalls
    assert tr_it[-1] < 1.25 * sigma2         # iterative decodes


def test_optimize_modified_improves_on_exp():
    cfg = SparcConfig(L=64, M=32, R=1.0)
    sigma2 = cfg.sigma2(2.5)
    p_opt, a, f = optimize_modified(cfg.L, cfg.P, sigma2, cfg.n, cfg.M,
                                    n_samples=512, na=4, nf=4)
    tr_opt = se_trajectory(p_opt, cfg.n, cfg.M, sigma2, n_samples=512)
    p_exp = exp_alloc(cfg.L, cfg.P, sigma2)
    tr_exp = se_trajectory(p_exp, cfg.n, cfg.M, sigma2, n_samples=512)
    assert tr_opt[-1] <= tr_exp[-1] * 1.05
    assert 0.4 <= f <= 1.0 and 0.4 <= a <= 1.3


def test_se_tau_schedule_mode_decodes():
    """tau_mode='se' uses the precomputed schedule instead of online tau."""
    cfg = SparcConfig(L=64, M=64, R=1.0, op_kind="hadamard", amp_iters=12,
                      tau_mode="se")
    model = SparcModel.build(cfg, ebno_db=6.0)
    assert model.tau2_schedule is not None
    assert model.tau2_schedule.shape == (cfg.amp_iters,)
    out = model.run_trials(jax.random.key(0), batch=4)
    assert int(out["bit_errors"]) == 0


def test_cli_se_smoke():
    r = subprocess.run(
        [sys.executable, "-m", "sparc_ldpc_tpu.cli", "se",
         "--preset", "plain_small", "--ebno", "6.0"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    rec = json.loads(r.stdout)
    assert rec["decodes"] is True
