"""On-chip gate + A/B for the Pallas layered QC-BP kernel.

1. BITWISE equality on the real TPU: engine="qc" (auto-routed Pallas
   kernel) vs engine="qc_xla" (pinned XLA graph) must agree on hard
   decisions, ok flags, iteration counts, and f32 posteriors — the
   contract that lets models/ldpc.py route production decodes to the
   kernel without re-anchoring any artifact.
2. Throughput A/B at the shipped concat shapes (docs/PERF.md protocol:
   distinct inputs per rep, R back-to-back dispatches, one fence).

Usage: python scripts/bp_pallas_ab.py [B_eff] [reps]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from sparc_ldpc_tpu.config import LdpcConfig
from sparc_ldpc_tpu.models.ldpc import LdpcModel


CODES = {
    # the shipped concat preset's array code (fully dense 4x24, Z=31)
    "array_z31": LdpcConfig(kind="array", z=31, rows_b=4, cols_b=24,
                            engine="qc", schedule="layered", bp_iters=32),
    # 802.11n r1/2: J=12, ~70% inactive blocks (trace-time sparsity case)
    "wifi_n648": LdpcConfig(kind="qc", path="wifi_n648_r12", engine="qc",
                            schedule="layered", bp_iters=32),
    # constructed rate-5/6 (dense rows, K=24, J=4, Z=27)
    "r56_n648": LdpcConfig(kind="qc", path="qc_n648_r56", engine="qc",
                           schedule="layered", bp_iters=32),
}


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 3072
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    print(f"devices: {jax.devices()}  B_eff={B}", flush=True)
    rng = np.random.default_rng(7)
    for name, cfg in CODES.items():
        mp = LdpcModel.build(cfg)                       # auto -> pallas
        mx = LdpcModel.build(cfg.replace(engine="qc_xla"))
        cw = mp.code.encode(rng.integers(0, 2, (B, mp.k)).astype(np.uint8))
        sigma = 0.75
        y = (1.0 - 2.0 * cw) + sigma * rng.standard_normal((B, mp.n))
        llr = jnp.asarray(2.0 * y / sigma ** 2, dtype=jnp.float32)

        t0 = time.time()
        rp = jax.jit(mp.decode)(llr)
        hp = np.asarray(rp.hard)
        c_p = time.time() - t0
        t0 = time.time()
        rx = jax.jit(mx.decode)(llr)
        hx = np.asarray(rx.hard)
        c_x = time.time() - t0
        np.testing.assert_array_equal(hp, hx)
        np.testing.assert_array_equal(np.asarray(rp.ok), np.asarray(rx.ok))
        np.testing.assert_array_equal(np.asarray(rp.iters),
                                      np.asarray(rx.iters))
        np.testing.assert_array_equal(np.asarray(rp.posterior),
                                      np.asarray(rx.posterior))
        nok = int(np.asarray(rp.ok).sum())
        print(f"{name}: BITWISE OK on chip (ok {nok}/{B}, "
              f"compile pallas {c_p:.1f}s / xla {c_x:.1f}s)", flush=True)

        # throughput: R distinct inputs, back-to-back dispatches, ONE
        # TINY fence (iters[:1]).  Fencing on the full hard/posterior
        # array hauls ~2.3 MB through the relay per measurement and
        # adds a ~20 ms constant to BOTH rows, understating the kernel
        # ratio (first cut of this script measured 1.79x/5.0x/2.0x
        # where the clean protocol reads 5.3x/21x/6.3x).
        llrs = [jnp.asarray(
            2.0 * ((1.0 - 2.0 * cw) + sigma
                   * rng.standard_normal((B, mp.n))) / sigma ** 2,
            dtype=jnp.float32) for _ in range(reps)]
        out = {}
        for tag, m in (("pallas", mp), ("xla", mx)):
            fn = jax.jit(lambda x, m=m: m.decode(x).iters[:1])
            _ = np.asarray(fn(llrs[0]))               # warm
            t0 = time.perf_counter()
            rs = [fn(x) for x in llrs]
            _ = np.asarray(rs[-1])
            out[tag] = (time.perf_counter() - t0) / reps
        print(f"{name}: pallas {out['pallas']*1e3:7.2f} ms  "
              f"xla {out['xla']*1e3:7.2f} ms  "
              f"speedup {out['xla']/out['pallas']:.2f}x "
              f"({B} cws x 32 layered iters)", flush=True)


if __name__ == "__main__":
    main()
