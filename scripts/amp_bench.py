"""Canonical AMP block benchmark with honest timing on the axon relay.

Measurement discipline (learned the hard way — see docs/PERF.md):
  - per-op microbenchmarks are meaningless here: a host<->device sync costs
    ~30 ms through the relay, and block_until_ready can return early;
  - therefore: time ONLY whole jitted blocks, use a distinct key block per
    rep (no caching/dedup), and force a scalar host readback every rep.

Usage: python scripts/amp_bench.py [reps]
"""

import sys
import time

import jax

from sparc_ldpc_tpu.config import SparcConfig
from sparc_ldpc_tpu.models.sparc import SparcModel
from sparc_ldpc_tpu.utils import rng as rngu


def time_block(model, B=128, reps=5):
    run = jax.jit(model.run_block)
    out = run(rngu.trial_keys(rngu.base_key(999), B))
    first = int(out["bit_errors"])              # forces full materialization
    times = []
    sec_err = 0
    for r in range(reps):
        keys = rngu.trial_keys(rngu.base_key(r), B)
        t0 = time.perf_counter()
        out = run(keys)
        sec_err = int(out["section_errors"])    # scalar readback = sync
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    return med, sec_err, float(out["tau2_final"])


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    B = 128
    print(f"devices: {jax.devices()}", file=sys.stderr)
    for scheme in ("rev", "mxu"):
        for prec in ("high", "bf16"):
            cfg = SparcConfig(L=1024, M=512, R=1.0, power_alloc="iterative",
                              op_kind="hadamard", amp_iters=32, amp_tol=0.0,
                              transform_precision=prec, fwht_scheme=scheme)
            model = SparcModel.build(cfg, ebno_db=2.0)
            med, sec_err, tau2 = time_block(model, B=B, reps=reps)
            print(f"{scheme:4s}/{prec:4s}: {med*1e3:7.1f} ms/block  "
                  f"{B*cfg.k_bits/med/1e6:6.2f} Mbit/s  "
                  f"sec_err={sec_err} tau2={tau2:.4f}", flush=True)


if __name__ == "__main__":
    main()
