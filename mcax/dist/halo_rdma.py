"""Pallas async remote-DMA halo exchange (C13 native tier, SURVEY.md §5).

The production halo path is one ``lax.ppermute`` per block (mcax.dist.halo)
— correct, but XLA schedules it as a standalone collective.  This module is
the survey-named native-tier upgrade (SNIPPETS.md [2] right-permute idiom):
each time shard pushes its overlap-save tail directly into its RIGHT
neighbor's receive buffer with ``pltpu.make_async_remote_copy`` over ICI.
Because the DMA is issued from a Pallas kernel it can overlap independent
compute the scheduler would otherwise serialise after a ppermute, and it is
the building block for future fused compute+comm kernels (ring variants of
the SRP pair sweep).

Select with ``MCAX_HALO=rdma`` (default ``ppermute``).  On non-TPU
platforms the kernel runs under Pallas TPU INTERPRET emulation, which
fully models the per-device remote copies on the forced multi-device CPU
mesh — tests/dist/test_halo_rdma.py pins it against the ppermute path
there, and ``dryrun_multichip`` exercises it when the flag is set.

Topology note: ``device_id_type=LOGICAL`` addresses the flat position in
the shard_map device list (row-major over the mesh axes), so the flat
neighbor index is rebuilt from every mesh axis — the ring runs along
``axis`` with all other axes held fixed.
"""

from __future__ import annotations

import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcax.dist.mesh import CHANNEL_AXIS, TIME_AXIS


def halo_impl() -> str:
    """Halo-exchange implementation: ``ppermute`` (default) | ``rdma``."""
    v = os.environ.get("MCAX_HALO", "ppermute").lower()
    if v not in ("ppermute", "rdma"):
        raise ValueError(f"MCAX_HALO must be ppermute|rdma, got {v!r}")
    return v


def _interpret():
    """Compile natively on real TPU; emulate (with true per-device remote
    copies) everywhere else."""
    if jax.default_backend() in ("tpu", "axon"):
        return False
    return pltpu.InterpretParams()


def ring_push_right(x_local: jnp.ndarray, axis: str = TIME_AXIS,
                    mesh_axes: Sequence[str] = (TIME_AXIS, CHANNEL_AXIS),
                    collective_id: int = 7) -> jnp.ndarray:
    """Push ``x_local`` to the right ring neighbor along ``axis``.

    Returns the LEFT neighbor's payload (ring wrap: shard 0 receives shard
    n-1's — callers overwrite shard 0's result with the streaming carry,
    exactly like the ppermute path discards into shard 0).

    Must run inside shard_map over a mesh containing ``axis`` (and any
    other axes named in ``mesh_axes``, in mesh order).
    """
    sizes = {name: lax.axis_size(name) for name in mesh_axes}
    if sizes[axis] == 1:
        return x_local

    def kernel(in_ref, out_ref, send_sem, recv_sem):
        # flat logical id of the neighbor one step right along `axis`,
        # same position on every other mesh axis (row-major flattening)
        flat = jnp.int32(0)
        for name in mesh_axes:
            idx = lax.axis_index(name)
            if name == axis:
                idx = lax.rem(idx + 1, sizes[name])
            flat = flat * sizes[name] + idx
        op = pltpu.make_async_remote_copy(
            src_ref=in_ref, dst_ref=out_ref,
            send_sem=send_sem, recv_sem=recv_sem,
            device_id=flat, device_id_type=pltpu.DeviceIdType.LOGICAL)
        op.start()
        op.wait()

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x_local.shape, x_local.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA] * 2,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=collective_id),
        interpret=_interpret(),
    )(x_local)
