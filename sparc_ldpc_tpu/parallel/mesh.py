"""Device mesh + sharding policy (SURVEY.md §2 parallelism breakdown).

Axes:
  'data'    — primary: Monte-Carlo codeword batch (embarrassingly parallel;
              only error-counter reductions cross it).
  'section' — secondary: SPARC sections (the ML coefficient axis).  Sharding
              is by *whole sections* so the (L, M) softmax stays local; the
              per-iteration scalars ||z||^2, ||beta||^2 become psums GSPMD
              inserts automatically (SURVEY.md §2 #14-15).

PP/EP are N/A for this workload (no layer stack, no MoE — SURVEY.md §2);
the long-context analog is large-L transform sharding, which rides the same
'section' axis through the Kronecker mode contractions (a sharded mode
becomes a distributed matmul).

Multi-host: jax.distributed.initialize() is called by the campaign CLI when
launched with coordinator env vars; the mesh then spans all processes'
devices and the same code runs unchanged (GSPMD over ICI within a slice,
DCN across hosts).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(section_shards: int = 1,
              data_axis: str = "data",
              section_axis: str = "section",
              devices=None) -> Mesh:
    """Mesh over all (local or global) devices: data x section."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % section_shards:
        raise ValueError(f"{n} devices not divisible by "
                         f"section_shards={section_shards}")
    arr = np.array(devices).reshape(n // section_shards, section_shards)
    return Mesh(arr, axis_names=(data_axis, section_axis))


@dataclass(frozen=True)
class ShardingPolicy:
    """Bundle of NamedShardings + in-loop constraint helpers.

    Passed to model builders; inside jit the constraint methods pin the
    layout of the AMP state so GSPMD shards the transform and denoiser the
    way SURVEY.md §2 prescribes instead of replicating.
    """
    mesh: Mesh
    data_axis: str = "data"
    section_axis: Optional[str] = "section"

    @property
    def section_shards(self) -> int:
        """Section-axis size (1 == pure DP, the in-kernel-encode-eligible
        case: each codeword's (L, M) state lives whole on one device)."""
        if self.section_axis is None:
            return 1
        return int(self.mesh.shape[self.section_axis])

    # ---- input/output shardings (for device_put / jit in_shardings) ----

    def batch1(self) -> NamedSharding:
        """(B,) per-trial arrays (keys, counters)."""
        return NamedSharding(self.mesh, P(self.data_axis))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    # ---- in-loop constraints (SURVEY.md §3.2 boundaries) ----

    def _c(self, x, *spec):
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, P(*spec)))

    def constrain_bml(self, x):
        """beta/u vectors (B, ML) or (B, N): data x section."""
        if self.section_axis is None:
            return self._c(x, self.data_axis, None)
        return self._c(x, self.data_axis, self.section_axis)

    def constrain_blm(self, x):
        """(B, L, M): shard L, keep sections whole (softmax local)."""
        if self.section_axis is None:
            return self._c(x, self.data_axis, None, None)
        return self._c(x, self.data_axis, self.section_axis, None)

    def constrain_bn(self, x):
        """(B, n) channel/residual vectors: data-sharded, replicated over
        section (n is small; the row gather out of the transform assembles
        it — the all-gather SURVEY.md §5 anticipates)."""
        return self._c(x, self.data_axis, None)
