"""Key-tree discipline for multi-host-deterministic Monte Carlo.

SURVEY.md §7 hard-part 5 / App. A.8: a single fold_in chain
``fold_in(base, point, block, trial)`` so that re-sharding or re-hosting a
campaign never changes which random draws a given logical trial sees.  Error
counters are therefore bitwise reproducible across mesh shapes (§4.4
identical-results tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def base_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def point_key(base: jax.Array, point_idx: int) -> jax.Array:
    return jax.random.fold_in(base, point_idx)


def block_key(point: jax.Array, block_idx) -> jax.Array:
    return jax.random.fold_in(point, block_idx)


def trial_keys(block: jax.Array, batch: int) -> jax.Array:
    """One key per trial in a block: fold_in by trial index, vmapped."""
    return jax.vmap(lambda i: jax.random.fold_in(block, i))(jnp.arange(batch))


def split_named(key: jax.Array, *names: str):
    """Derive independent named subkeys (message/noise/...) deterministically.

    Uses fold_in with a stable per-name integer (the index in the call), so
    the mapping is positional and documented at the call site.
    """
    return tuple(jax.random.fold_in(key, i) for i, _ in enumerate(names))
