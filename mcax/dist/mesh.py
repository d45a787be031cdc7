"""Device-mesh construction for the ('time', 'channel') layout (C13).

The mesh is the TPU-native replacement for the reference's (nonexistent)
multi-process runtime: ``time`` is the sequence/context-parallel axis,
``channel`` the tensor-parallel axis.  Axis order puts ``channel`` innermost
so channel collectives (all_gather of spectra, psum of pair partials — the
chatty ones) ride neighboring ICI links.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TIME_AXIS = "time"
CHANNEL_AXIS = "channel"


def make_mesh(time_shards: int = 1, channel_shards: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """A ('time', 'channel') mesh over the given (or all) devices."""
    devs = list(devices) if devices is not None else jax.devices()
    need = time_shards * channel_shards
    if len(devs) < need:
        raise ValueError(f"need {need} devices, have {len(devs)}")
    grid = np.asarray(devs[:need]).reshape(time_shards, channel_shards)
    return Mesh(grid, (TIME_AXIS, CHANNEL_AXIS))


def sample_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for input sample blocks [C, N]: mics over 'channel', the
    sample/time axis over 'time'."""
    return NamedSharding(mesh, P(CHANNEL_AXIS, TIME_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def auto_factor(n_devices: int, num_mics: int) -> tuple[int, int]:
    """Pick (time_shards, channel_shards) for n devices: the largest
    power-of-two channel axis that divides the mic count (capped at mics//2
    so every shard keeps >=2 mics), rest on time."""
    cs = 1
    while (cs * 2 <= n_devices and num_mics % (cs * 2) == 0
           and cs * 2 <= num_mics // 2 and n_devices % (cs * 2) == 0):
        cs *= 2
    return n_devices // cs, cs
