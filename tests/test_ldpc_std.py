"""Standard 802.11n QC-LDPC codes (SURVEY.md §2 #16; VERDICT round-1
missing #2): structural verification of the checked-in base matrices and
decode tests with both BP engines.

Exact shift values cannot be re-fetched in this offline environment (the
data files document this), so the tests pin the *structural* invariants of
the 802.11n family — dual-diagonal encodable parity part, full rank (rate
exactly 1/2), 4-cycle-free expansion — plus working BP waterfall behavior.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sparc_ldpc_tpu.config import LdpcConfig
from sparc_ldpc_tpu.design.ldpc_codes import (
    STANDARD_CODES, load_qc_base, qc_base_H, systematize)
from sparc_ldpc_tpu.models.ldpc import LdpcModel


EXPECT = {"wifi_n648_r12": 27, "wifi_n1296_r12": 54, "wifi_n1944_r12": 81}


@pytest.mark.parametrize("name", STANDARD_CODES)
def test_base_matrix_structure(name):
    shifts, Z = load_qc_base(name)
    assert Z == EXPECT[name]
    J, K = shifts.shape
    assert (J, K) == (12, 24)
    # dual-diagonal parity part: anchor column 12 has exactly three
    # circulants (rows 0, mid, 11) with shifts (1, 0, 1); columns 13..23
    # carry the double diagonal of 0-shifts
    col12 = shifts[:, 12]
    nz = np.nonzero(col12 >= 0)[0]
    assert nz[0] == 0 and nz[-1] == 11 and len(nz) == 3
    assert col12[0] == 1 and col12[11] == 1 and col12[nz[1]] == 0
    for j in range(11):
        assert shifts[j, 13 + j] == 0 and shifts[j + 1, 13 + j] == 0
        assert np.count_nonzero(shifts[:, 13 + j] >= 0) == 2
    assert shifts[11, 23] == 0


@pytest.mark.parametrize("name", STANDARD_CODES)
def test_expanded_code_properties(name):
    shifts, Z = load_qc_base(name)
    H = qc_base_H(shifts, Z)
    m, n = H.shape
    assert (m, n) == (12 * Z, 24 * Z)
    code = systematize(H)          # asserts G H^T = 0 internally
    assert code.k == n - m, "H must be full rank (rate exactly 1/2)"
    # girth >= 6: no two rows share more than one column
    overlap = (H.astype(np.int32) @ H.T.astype(np.int32))
    np.fill_diagonal(overlap, 0)
    assert overlap.max() <= 1, "4-cycle in expanded H"


@pytest.mark.parametrize("engine,schedule", [("edge", "flooding"),
                                             ("qc", "flooding"),
                                             ("qc", "layered")])
def test_wifi648_decodes_both_engines(engine, schedule, rng):
    """A published-standard code decodes cleanly with both BP engines
    (VERDICT 'done' criterion)."""
    cfg = LdpcConfig(kind="qc", path="wifi_n648_r12", decoder="minsum",
                     engine=engine, schedule=schedule, bp_iters=48)
    lm = LdpcModel.build(cfg)
    assert (lm.n, lm.k) == (648, 324)
    B, sigma = 8, 0.78               # ~2.2 dB Eb/N0 at rate 1/2: waterfall
    u = rng.integers(0, 2, (B, lm.k)).astype(np.uint8)
    cw = lm.code.encode(u)
    y = (1.0 - 2.0 * cw) + sigma * rng.standard_normal((B, lm.n))
    llr = jnp.asarray(2.0 * y / sigma**2, dtype=jnp.float32)
    res = lm.decode(llr)
    assert int(res.ok.sum()) == B
    np.testing.assert_array_equal(np.asarray(res.hard), cw)


def test_wifi648_waterfall(rng):
    """BER drops by >=10x across ~1 dB — BP actually works on the standard
    code rather than merely passing syndrome checks at high SNR."""
    cfg = LdpcConfig(kind="qc", path="wifi_n648_r12", decoder="minsum",
                     engine="qc", schedule="layered", bp_iters=48)
    lm = LdpcModel.build(cfg)
    B = 24
    u = rng.integers(0, 2, (B, lm.k)).astype(np.uint8)
    cw = lm.code.encode(u)
    errs = {}
    for sigma in (1.0, 0.79):        # ~0.0 dB vs ~2.05 dB at rate 1/2
        y = (1.0 - 2.0 * cw) + sigma * rng.standard_normal((B, lm.n))
        llr = jnp.asarray(2.0 * y / sigma**2, dtype=jnp.float32)
        res = lm.decode(llr)
        errs[sigma] = int((np.asarray(res.hard) != cw).sum())
    assert errs[1.0] > 10 * max(errs[0.79], 1) or errs[0.79] == 0, errs
