"""Replication-provable collectives + the shard_map guard mode (C13).

SURVEY.md §5 lists shard_map replication checking among the designed
numerics/race guards.  JAX's ``check_vma=True`` statically verifies that
every output declared replicated (PartitionSpec()) really is — but its
inference cannot prove replication through ``lax.all_gather`` (each shard
*does* end up with identical bytes, yet the type system conservatively
keeps the output "possibly varying").  This JAX (0.9) has no
``all_gather_invariant``, so mcax carries its own:

  ``all_gather_invariant(x, axis_name)`` — each shard scatters its slice
  into a zeros tensor of the gathered shape and the result is ``psum``-ed,
  whose output IS provably unvarying.  It moves axis_size× more bytes
  through the reduction than a plain all-gather, so it is used (a) always,
  for tiny state carries, and (b) for the data-path gathers only in GUARD
  MODE (``MCAX_CHECK_VMA=1``), where ``ShardedPipeline`` also turns on
  ``check_vma=True``.  CI runs the guard mode and asserts it matches the
  production all-gather path bit-for-bit (tests/dist/test_guards.py), so
  an out-spec mistake in a new algo branch fails loudly instead of
  shipping silently (VERDICT.md round-1 weak item 5).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
from jax import lax


def guard_enabled() -> bool:
    """Replication-guard mode: check_vma=True + invariant data gathers."""
    return os.environ.get("MCAX_CHECK_VMA", "0") == "1"


def all_gather_invariant(x: jnp.ndarray, axis_name: str, axis: int = 0,
                         tiled: bool = True) -> jnp.ndarray:
    """all_gather whose output is *provably* replicated over ``axis_name``.

    Semantically identical to ``lax.all_gather(x, axis_name, axis=axis,
    tiled=tiled)``: shard i's slice lands at offset i along ``axis``.
    Implemented as scatter-into-zeros + psum so vma inference sees an
    unvarying output.  Since every position is written by exactly one
    shard and the rest contribute exact zeros, the psum is bit-exact (no
    float reassociation: 0 + v == v).
    """
    n = lax.axis_size(axis_name)
    if n == 1:
        return x if tiled else jnp.expand_dims(x, axis)
    i = lax.axis_index(axis_name)
    if tiled:
        k = x.shape[axis]
        shape = x.shape[:axis] + (n * k,) + x.shape[axis + 1:]
        start = [jnp.zeros((), jnp.int32)] * len(shape)
        start[axis] = i * k
    else:
        x = jnp.expand_dims(x, axis)
        shape = x.shape[:axis] + (n,) + x.shape[axis + 1:]
        start = [jnp.zeros((), jnp.int32)] * len(shape)
        start[axis] = i
    full = lax.dynamic_update_slice(jnp.zeros(shape, x.dtype), x,
                                    tuple(start))
    return lax.psum(full, axis_name)


def gather(x: jnp.ndarray, axis_name: str, axis: int = 0,
           tiled: bool = True) -> jnp.ndarray:
    """Data-path gather: plain all_gather in production, the invariant
    (replication-provable) form in guard mode."""
    if guard_enabled():
        return all_gather_invariant(x, axis_name, axis=axis, tiled=tiled)
    return lax.all_gather(x, axis_name, axis=axis, tiled=tiled)
