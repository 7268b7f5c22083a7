"""A/B: synchronous vs double-buffered campaign dispatch (round-4
VERDICT weak #1 -> round-5 item 3).

Two measurements on the real chip:

1. Raw-loop A/B on the HEADLINE config (pa_l1024 bench route, B=2048):
   the same N key blocks run (a) sequentially — read each block's
   counters before dispatching the next, paying one ~25-30 ms relay
   round-trip per block — and (b) pipelined — submit block b+1, then
   read block b.  Same blocks, same kernels => counters must be
   IDENTICAL; wall time shows the recovered sync share.

2. Driver-level check: parallel/campaign.run_point with pipelined=False
   vs =True on a real budgeted point, asserting the journaled per-block
   counter records agree on every common block index (the pipelined run
   over-dispatches at most one trailing block, by design).

Usage: python scripts/pipeline_ab.py [n_blocks]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from sparc_ldpc_tpu.config import SparcConfig
from sparc_ldpc_tpu.models.sparc import SparcModel
from sparc_ldpc_tpu.parallel.campaign import run_point
from sparc_ldpc_tpu.utils import io as iou
from sparc_ldpc_tpu.utils import rng as rngu


def loop_ab(run, blocks, label, kb):
    be = 0
    t0 = time.perf_counter()
    for tk in blocks:
        be += int(run(tk)["bit_errors"])
    t_seq = (time.perf_counter() - t0) / len(blocks)

    be_p = 0
    pend = None
    t0 = time.perf_counter()
    for tk in blocks:
        nxt = run(tk)
        if pend is not None:
            be_p += int(pend["bit_errors"])
        pend = nxt
    be_p += int(pend["bit_errors"])
    t_pipe = (time.perf_counter() - t0) / len(blocks)
    assert be_p == be, (be_p, be)
    B = blocks[0].shape[0]
    print(f"{label}: sequential {t_seq*1e3:7.1f} ms/block "
          f"({B*kb/t_seq/1e6:6.2f} Mbit/s)  pipelined "
          f"{t_pipe*1e3:7.1f} ms/block ({B*kb/t_pipe/1e6:6.2f} Mbit/s)  "
          f"+{100*(t_seq/t_pipe-1):.1f}%  counters identical ({be})",
          flush=True)


def main():
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    print(f"devices: {jax.devices()}", flush=True)

    # headline bench route (bench.py cfg)
    cfg = SparcConfig(L=1024, M=512, R=1.0, power_alloc="iterative",
                      op_kind="hadamard", amp_iters=32, amp_tol=0.0,
                      transform_precision="bf16", amp_kernel="fused_split",
                      amp_iters_auto=True, amp_noise_in_kernel=True)
    model = SparcModel.build(cfg, ebno_db=2.0)
    run = jax.jit(model.run_block)
    B = 2048
    blocks = [rngu.trial_keys(rngu.base_key(100 + b), B)
              for b in range(n_blocks)]
    t0 = time.perf_counter()
    _ = int(run(blocks[0])["bit_errors"])
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    loop_ab(run, blocks, f"headline pa_l1024 B={B}", cfg.k_bits)

    # driver-level: same budgeted point, both modes, journaled
    pkey = rngu.point_key(rngu.base_key(0), 0)
    with tempfile.TemporaryDirectory() as d:
        js, jp = os.path.join(d, "sync.jsonl"), os.path.join(d, "pipe.jsonl")
        tot_s = run_point(run, pkey, 512, min_frame_errors=10**9,
                          max_trials=8 * 512,
                          state=iou.CampaignState(js), pipelined=False)
        tot_p = run_point(run, pkey, 512, min_frame_errors=10**9,
                          max_trials=8 * 512,
                          state=iou.CampaignState(jp), pipelined=True)
        def counters_of(path):
            return {r["block"]: {k: v for k, v in r.items()
                                 if k not in ("kind", "point", "block")}
                    for r in (json.loads(l) for l in open(path))
                    if r.get("kind") == "block"}

        by_s = counters_of(js)
        by_p = counters_of(jp)
        common = sorted(set(by_s) & set(by_p))
        assert common, (list(by_s), list(by_p))
        for b in common:
            assert by_s[b] == by_p[b], (b, by_s[b], by_p[b])
        extra = sorted(set(by_p) - set(by_s))
        assert len(extra) <= 1, extra
        print(f"run_point journal check: {len(common)} common blocks "
              f"identical, over-dispatched={extra}  "
              f"sync exec_wall {tot_s['exec_wall_s']:.2f}s vs pipelined "
              f"{tot_p['exec_wall_s']:.2f}s", flush=True)


if __name__ == "__main__":
    main()
