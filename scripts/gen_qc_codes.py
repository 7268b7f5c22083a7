"""Generate higher-rate QC-LDPC base matrices in the 802.11n structure
(dual-diagonal encodable parity part + anchor column), with girth-aware
randomized shift selection.

These are CONSTRUCTED codes, not transcriptions of the standard tables
(this offline environment cannot verify exact standard shift values beyond
the rate-1/2 family already shipped) — the .qc headers say so.  What is
guaranteed, by construction + verification here and in
tests/test_ldpc_std.py: dual-diagonal parity part (linear-time encodable),
full rank (exact design rate), 4-cycle-free expansion (girth >= 6), and a
BP waterfall.

Usage: python scripts/gen_qc_codes.py   (writes sparc_ldpc_tpu/data/*.qc)
"""

import os
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from sparc_ldpc_tpu.design.ldpc_codes import qc_base_H, systematize

DATA = os.path.join(os.path.dirname(__file__), "..", "sparc_ldpc_tpu",
                    "data")


def four_cycle_free(shifts, Z):
    """No 4-cycles in the expanded graph: for every column pair, the
    per-row shift deltas (mod Z) must be distinct over shared rows."""
    J, K = shifts.shape
    for k1 in range(K):
        for k2 in range(k1 + 1, K):
            rows = np.nonzero((shifts[:, k1] >= 0)
                              & (shifts[:, k2] >= 0))[0]
            if len(rows) < 2:
                continue
            d = (shifts[rows, k1] - shifts[rows, k2]) % Z
            if len(np.unique(d)) != len(d):
                return False
    return True


def gen_base(J, K, Z, col_weight, seed, tries=20000):
    """Greedy column-by-column construction with 4-cycle rejection."""
    rng = np.random.default_rng(seed)
    shifts = -np.ones((J, K), dtype=np.int64)
    # parity part (last J columns): anchor column with circulants at rows
    # (0, J//2, J-1) shifted (1, 0, 1); then the double diagonal of 0s.
    a = K - J
    shifts[0, a] = 1
    shifts[J // 2, a] = 0
    shifts[J - 1, a] = 1
    for j in range(J - 1):
        shifts[j, a + 1 + j] = 0
        shifts[j + 1, a + 1 + j] = 0
    for k in range(a):                       # data columns
        w = min(col_weight, J)
        for attempt in range(tries):
            rows = np.sort(rng.choice(J, size=w, replace=False))
            cand = shifts.copy()
            cand[rows, k] = rng.integers(0, Z, size=w)
            if four_cycle_free(cand[:, : max(k + 1, a + J)], Z):
                shifts = cand
                break
        else:
            raise RuntimeError(f"no 4-cycle-free placement col {k}")
    return shifts


def write_qc(name, shifts, Z, rate_str):
    J, K = shifts.shape
    path = os.path.join(DATA, name + ".qc")
    with open(path, "w") as f:
        f.write(f"# QC-LDPC base matrix, 802.11n STRUCTURE, n={K*Z}, "
                f"rate {rate_str}, Z={Z} ({J}x{K}).\n")
        f.write("# CONSTRUCTED shifts (girth-aware randomized selection, "
                "scripts/gen_qc_codes.py),\n")
        f.write("# NOT a transcription of the standard table — this "
                "offline environment cannot\n")
        f.write("# verify exact standard shift values beyond the shipped "
                "rate-1/2 family.\n")
        f.write("# Verified: dual-diagonal encodable parity part, full "
                "rank (exact design rate),\n")
        f.write("# 4-cycle-free expansion (girth >= 6), BP waterfall "
                "(tests/test_ldpc_std.py).\n")
        f.write(f"{Z}\n")
        for j in range(J):
            f.write(" ".join(f"{int(v):3d}" for v in shifts[j]) + "\n")
    print(f"wrote {path}")


def main():
    specs = [
        # (name, J, K, Z, col_weight, seed, rate)
        ("qc_n648_r23", 8, 24, 27, 3, 11, "2/3"),
        ("qc_n648_r34", 6, 24, 27, 3, 12, "3/4"),
        ("qc_n648_r56", 4, 24, 27, 3, 13, "5/6"),
    ]
    for name, J, K, Z, w, seed, rate in specs:
        shifts = gen_base(J, K, Z, w, seed)
        H = qc_base_H(shifts, Z)
        code = systematize(H)                # asserts G H^T = 0
        assert code.k == (K - J) * Z, (name, code.k)
        ov = H.astype(np.int32) @ H.T.astype(np.int32)
        np.fill_diagonal(ov, 0)
        assert ov.max() <= 1, name
        write_qc(name, shifts, Z, rate)


if __name__ == "__main__":
    main()
