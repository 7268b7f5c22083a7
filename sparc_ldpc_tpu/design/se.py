"""State evolution for SPARC-AMP (SURVEY.md App. A.5, §2 #7).

The scalar recursion predicting the AMP effective-noise trajectory:

    tau2_0    = sigma2 + P
    tau2_{t+1} = sigma2 + P * (1 - x(tau2_t))

with the expected fraction of power decoded

    x(tau2) = sum_l (P_l / P) * E[ exp(nu_l (U_1 + nu_l))
                / ( exp(nu_l (U_1 + nu_l)) + sum_{j=2}^M exp(nu_l U_j) ) ],
    nu_l = sqrt(n P_l) / tau,   U_j iid N(0,1).

Evaluated by vectorized Monte-Carlo with common random numbers (same U draws
shared across sections and across tau values within one design run), which
makes the PA search in power.py smooth.  float64 host-side NumPy.
"""

from __future__ import annotations

import numpy as np

__all__ = ["se_section_success", "se_x", "se_trajectory"]


def _logsumexp(a: np.ndarray, axis: int) -> np.ndarray:
    m = np.max(a, axis=axis, keepdims=True)
    return (m + np.log(np.sum(np.exp(a - m), axis=axis, keepdims=True))).squeeze(axis)


def se_section_success(nu: np.ndarray, U: np.ndarray) -> np.ndarray:
    """E-hat[success prob] per nu value, sharing the sample matrix U.

    Args:
      nu: (K,) array of nu = sqrt(n P_l)/tau values.
      U: (S, M) standard-normal samples (S Monte-Carlo draws).
    Returns: (K,) estimated posterior mass on the true column.
    """
    nu = np.atleast_1d(np.asarray(nu, dtype=np.float64))
    out = np.empty(nu.shape[0], dtype=np.float64)
    U1 = U[:, 0]          # (S,)
    Urest = U[:, 1:]      # (S, M-1)
    # chunk over nu to bound memory at (chunk, S, M-1)
    chunk = max(1, int(2e7 // max(1, U.size)))
    for i in range(0, nu.shape[0], chunk):
        nv = nu[i:i + chunk][:, None]                       # (c, 1)
        true_score = nv * (U1[None, :] + nv)                # (c, S)
        rest = _logsumexp(nv[:, :, None] * Urest[None, :, :], axis=2)  # (c, S)
        # success = sigmoid(true_score - logsumexp(rest))
        d = true_score - rest
        out[i:i + chunk] = np.mean(np.where(d > 0,
                                            1.0 / (1.0 + np.exp(-d)),
                                            np.exp(d) / (1.0 + np.exp(d))),
                                   axis=1)
    return out


def se_x(tau2: float, p_alloc: np.ndarray, n: int, M: int,
         U: np.ndarray) -> float:
    """x(tau2): expected decoded power fraction (SURVEY.md App. A.5)."""
    P = float(np.sum(p_alloc))
    nu = np.sqrt(n * p_alloc) / np.sqrt(tau2)
    # dedupe nu values (flat PA -> 1 unique; exp PA -> many but cheap anyway)
    uniq, inv = np.unique(nu, return_inverse=True)
    succ = se_section_success(uniq, U)[inv]
    return float(np.sum((p_alloc / P) * succ))


def se_trajectory(p_alloc: np.ndarray, n: int, M: int, sigma2: float,
                  T: int = 64, tol: float = 1e-7, n_samples: int = 4096,
                  seed: int = 0) -> np.ndarray:
    """Iterate SE; returns the tau2 trace (length <= T+1, includes tau2_0).

    Stops early when |tau2_{t+1} - tau2_t| < tol * tau2_t.
    """
    rng = np.random.default_rng(seed)
    U = rng.standard_normal((n_samples, M))
    P = float(np.sum(p_alloc))
    tau2 = sigma2 + P
    trace = [tau2]
    for _ in range(T):
        x = se_x(tau2, p_alloc, n, M, U)
        new = sigma2 + P * (1.0 - x)
        trace.append(new)
        if abs(new - tau2) < tol * tau2:
            break
        tau2 = new
    return np.asarray(trace)
