"""Stage budget for the shipped `concat` preset block (round-4 VERDICT
weak #2: the concat chain never got the speed-of-light rigor configs 2/3
got — nobody knew whether the ~83 ms block was BP compute, feedback AMP,
LLR extraction, or dispatch overhead).

Measurement protocol (docs/PERF.md): per-op timings are meaningless
through the ~25-30 ms relay, so each stage is timed as R back-to-back
dispatches on R pre-staged, distinct, device-resident inputs with ONE
readback fence at the end: wall ~= R * stage + 1 RT, and the separately
measured RT is subtracted.  The full chain is timed production-style
(run_block_staged + one scalar readback per block), both sequentially
and with pipelined dispatch (submit block b+1 before reading b's
counters — parallel/campaign.py round 5).

Stages:
  s1   gen + (in-kernel encode+noise) + inner AMP  (fused split kernel)
  s2   LLR extract + QC-layered BP + ok-gating     (one jit, as shipped)
  s2a  LLR extract alone (pair-fold sums over the (B, Lp, M) beta slab)
  s2b  QC-layered BP alone (on s2a's LLRs)
  s3   pinned feedback AMP + counter reduction

Usage: python scripts/concat_stage_budget.py [ebno_db] [preset]
Writes a table to stdout (tee it into results/).
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import numpy as np

from sparc_ldpc_tpu.config import PRESETS
from sparc_ldpc_tpu.models.concat import ConcatModel
from sparc_ldpc_tpu.utils import rng as rngu


def fence(x):
    np.asarray(jax.device_get(x))


import jax.numpy as jnp

_tiny = None


def measure_rt(reps=5):
    """Median dispatch+readback round-trip on a FRESH tiny computation
    (device_get of an already-fetched array is cached and reads ~0)."""
    global _tiny
    if _tiny is None:
        _tiny = jax.jit(lambda x: x + 1)
        fence(_tiny(jnp.float32(0)))
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        fence(_tiny(jnp.float32(r)))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def time_stage(fn, inputs, pick, rt):
    """R back-to-back async dispatches + one fence; returns s/call.

    The program is re-warmed IMMEDIATELY before timing (one run + fence):
    without it, a program that was warmed early and then displaced by
    other programs' dispatches pays a constant ~100 ms/call re-load
    through the relay, which read as a bogus B-independent 97-100 ms for
    the s2a/s2b sub-stages on the first cut of this script."""
    w = fn(*inputs[0])
    fence(pick(w))
    outs = []
    t0 = time.perf_counter()
    for a in inputs:
        outs.append(fn(*a))
    fence(pick(outs[-1]))
    wall = time.perf_counter() - t0
    return max(wall - rt, 0.0) / len(inputs), outs


def main():
    ebno = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    preset = sys.argv[2] if len(sys.argv) > 2 else "concat"
    R = 4
    print(f"devices: {jax.devices()}  preset={preset}  ebno={ebno} dB",
          flush=True)
    for B in (128, 512):
        m = ConcatModel.build(PRESETS[preset], ebno_db=ebno)
        s1 = jax.jit(m._stage_gen_amp)
        s2 = jax.jit(m._bp_from_beta)
        s2a = jax.jit(m._protected_llrs_from_beta)
        s2b = jax.jit(lambda llr: m.ldpc.decode(llr).hard)
        s3 = jax.jit(m._stage_finish)
        kbs = [rngu.trial_keys(
            rngu.block_key(rngu.point_key(rngu.base_key(7), 0), b), B)
            for b in range(R)]

        t0 = time.perf_counter()
        o = s1(kbs[0])
        cw, ok, _ = s2(o[2])
        llr0 = s2a(o[2])
        _ = s2b(llr0.reshape(B * m.num_cw, m.ldpc.n))
        out = s3(o[1], cw, ok, o[0], o[3], o[4])
        fence(out["bit_errors"])
        compile_s = time.perf_counter() - t0
        rt = measure_rt()
        print(f"\nB={B}: compile+first {compile_s:.1f}s  relay RT "
              f"{rt*1e3:.1f} ms  (num_cw={m.num_cw}, "
              f"noise_in_kernel={m._noise_in_kernel})", flush=True)

        t_s1, o1 = time_stage(s1, [(kb,) for kb in kbs],
                              lambda o: o[3], rt)
        t_s2, o2 = time_stage(s2, [(o[2],) for o in o1],
                              lambda o: o[1], rt)
        t_s2a, oa = time_stage(s2a, [(o[2],) for o in o1],
                               lambda o: o[:1, :1], rt)
        llrs = [a.reshape(B * m.num_cw, m.ldpc.n) for a in oa]
        t_s2b, _ = time_stage(s2b, [(l,) for l in llrs],
                              lambda o: o[:1, :1], rt)
        t_s3, _ = time_stage(
            s3, [(o[1], c, k, o[0], o[3], o[4])
                 for o, (c, k, _i) in zip(o1, o2)],
            lambda o: o["bit_errors"], rt)
        del o1, o2, oa, llrs

        # production-style full chain: sequential (one fence per block)
        # vs pipelined (submit b+1 before reading b)
        N = 16
        blocks = [rngu.trial_keys(
            rngu.block_key(rngu.point_key(rngu.base_key(9), 0), b), B)
            for b in range(N)]
        run = m.run_block_staged
        be_seq = 0
        t0 = time.perf_counter()
        for kb in blocks:
            be_seq += int(run(kb)["bit_errors"])
        t_seq = (time.perf_counter() - t0) / N
        be_pipe = 0
        pend = None
        t0 = time.perf_counter()
        for kb in blocks:
            nxt = run(kb)
            if pend is not None:
                be_pipe += int(pend["bit_errors"])
            pend = nxt
        be_pipe += int(pend["bit_errors"])
        t_pipe = (time.perf_counter() - t0) / N
        assert be_pipe == be_seq, (be_pipe, be_seq)

        tot = t_s1 + t_s2 + t_s3
        kb_user = m.k_user
        print(f"  s1  gen+encode+noise+inner-AMP : {t_s1*1e3:7.2f} ms  "
              f"({100*t_s1/tot:4.1f}% of stage sum)")
        print(f"  s2  LLR+BP+gate (as shipped)   : {t_s2*1e3:7.2f} ms  "
              f"({100*t_s2/tot:4.1f}%)")
        print(f"      s2a LLR extract alone      : {t_s2a*1e3:7.2f} ms")
        print(f"      s2b QC-layered BP alone    : {t_s2b*1e3:7.2f} ms")
        print(f"  s3  feedback-AMP+counters      : {t_s3*1e3:7.2f} ms  "
              f"({100*t_s3/tot:4.1f}%)")
        print(f"  stage sum                      : {tot*1e3:7.2f} ms")
        print(f"  full chain sequential          : {t_seq*1e3:7.2f} ms "
              f"-> {B*kb_user/t_seq/1e6:6.2f} Mbit/s "
              f"(dispatch+RT share {100*(t_seq-tot)/t_seq:4.1f}%)")
        print(f"  full chain pipelined dispatch  : {t_pipe*1e3:7.2f} ms "
              f"-> {B*kb_user/t_pipe/1e6:6.2f} Mbit/s  "
              f"[counters identical: {be_seq}]", flush=True)


if __name__ == "__main__":
    main()
