"""Worker process for the multi-host smoke test (SURVEY.md §4.4).

Launched K times by tests/test_multihost.py with env:
  SPARC_COORD=localhost:<port>  SPARC_NPROC=K  SPARC_PROC_ID=k

Each process contributes its CPU device(s) to a global mesh via
jax.distributed.initialize, runs one sharded Monte-Carlo block on the global
('data',) mesh, and process 0 prints the psum-reduced counters as JSON.
The test asserts they equal a single-process run with the same key tree —
the multi-host determinism contract (SURVEY.md §7 hard-part 5).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    coord = os.environ["SPARC_COORD"]
    nproc = int(os.environ["SPARC_NPROC"])
    pid = int(os.environ["SPARC_PROC_ID"])
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sparc_ldpc_tpu.config import SparcConfig
    from sparc_ldpc_tpu.models.sparc import SparcModel
    from sparc_ldpc_tpu.parallel.mesh import ShardingPolicy, make_mesh
    from sparc_ldpc_tpu.utils import rng as rngu

    sec = int(os.environ.get("SPARC_SECTION_SHARDS", "1"))
    cfg = SparcConfig(L=32, M=64, R=1.0, op_kind="hadamard", amp_iters=8,
                      fwht_dist=os.environ.get("SPARC_FWHT_DIST", "gspmd"))
    mesh = make_mesh(section_shards=sec)        # global devices: data x section
    policy = ShardingPolicy(mesh,
                            section_axis="section" if sec > 1 else None)
    model = SparcModel.build(cfg, ebno_db=5.0, policy=policy)

    batch = 8
    tkeys = rngu.trial_keys(rngu.base_key(42), batch)
    # Build the global sharded key array: every process knows the full key
    # tree (it is derived from the seed), and make_array_from_callback hands
    # each device its slice — no cross-process data movement.
    kd = np.asarray(jax.random.key_data(tkeys))           # (B, 2) uint32
    kd_sharding = NamedSharding(mesh, P("data", None))
    kd_global = jax.make_array_from_callback(
        kd.shape, kd_sharding, lambda idx: kd[idx])

    def run(kdat):
        return model.run_block(jax.random.wrap_key_data(kdat))

    with jax.sharding.set_mesh(mesh):
        out = jax.jit(run, out_shardings=NamedSharding(mesh, P()))(kd_global)
    result = {k: int(jax.device_get(v)) for k, v in out.items()
              if k in ("bit_errors", "frame_errors", "section_errors",
                       "trials")}
    if jax.process_index() == 0:
        print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
