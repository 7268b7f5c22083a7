"""NumPy oracle BP decoders: sum-product and normalized min-sum.

SURVEY.md App. A.6.  Flooding schedule, syndrome early stop, LLR clipping.
Convention: LLR lambda_v = log P(bit=0)/P(bit=1); a positive message votes
for bit 0.  Check node sign uses the tanh rule.  Independent of the TPU BP
in ops/bp.py (parity-tested).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..design.ldpc_codes import LdpcCode, Adjacency, adjacency


def bp_decode(llr: np.ndarray, code: LdpcCode, iters: int = 64,
              method: str = "minsum", alpha: float = 0.8125,
              beta: float = 0.15, clip: float = 20.0,
              adj: Optional[Adjacency] = None) -> Tuple[np.ndarray, np.ndarray, int]:
    """Flooding BP on one codeword.

    Returns (hard_bits, posterior_llr, iters_used).
    """
    adj = adj or adjacency(code.H)
    m, n = code.H.shape
    max_dc = adj.max_dc
    llr = np.clip(llr.astype(np.float64), -clip, clip)

    m_cv = np.zeros((m, max_dc))                     # check -> var messages
    tot = llr.copy()
    it_used = iters
    for it in range(iters):
        # variable -> check: tot[v] - m_cv for each edge
        v_of_edge = adj.check_nbr                     # (m, max_dc)
        m_vc = tot[v_of_edge] - m_cv                  # (m, max_dc)
        m_vc = np.clip(m_vc, -clip, clip)
        m_vc = np.where(adj.check_mask, m_vc, np.inf)  # pads neutral for min
        sign = np.where(adj.check_mask, np.sign(m_vc + (m_vc == 0)), 1.0)
        sign_prod = np.prod(sign, axis=1, keepdims=True)
        mag = np.abs(m_vc)
        if method in ("minsum", "oms"):
            # exclude-self min via (min1, min2)
            order = np.argsort(mag, axis=1)
            min1 = np.take_along_axis(mag, order[:, :1], axis=1)
            min2 = np.take_along_axis(mag, order[:, 1:2], axis=1)
            is_min1 = mag == min1
            exc_min = np.where(is_min1, min2, min1)
            if method == "oms":
                new_cv = (sign_prod * sign) * np.maximum(exc_min - beta, 0.0)
            else:
                new_cv = alpha * (sign_prod * sign) * exc_min
        elif method == "spa":
            phi = _phi(np.where(adj.check_mask, mag, np.inf))
            phi_sum = np.sum(np.where(adj.check_mask, phi, 0.0), axis=1,
                             keepdims=True)
            exc = _phi(np.maximum(phi_sum - phi, 1e-12))
            new_cv = (sign_prod * sign) * exc
        else:
            raise ValueError(method)
        m_cv = np.where(adj.check_mask, np.clip(new_cv, -clip, clip), 0.0)
        # total per variable: llr + sum of incoming check messages
        flat = m_cv.reshape(-1)
        incoming = np.where(adj.var_mask, flat[adj.var_edge], 0.0)
        tot = llr + incoming.sum(axis=1)
        hard = (tot < 0).astype(np.uint8)
        if not np.any(code.syndrome(hard)):
            it_used = it + 1
            break
    hard = (tot < 0).astype(np.uint8)
    return hard, tot, it_used


def _phi(x: np.ndarray) -> np.ndarray:
    """phi(x) = -log tanh(x/2), self-inverse, clipped for stability."""
    x = np.clip(x, 1e-12, 40.0)
    return -np.log(np.tanh(x / 2.0))
