"""Scale the pipeline over a ('time', 'channel') device mesh.

The capability the single-process reference never had (SURVEY.md §3.5):
the same config-3 chain sharded over every visible device — time shards
exchange overlap-save halos, channel shards compute their mic-pair slice
of the SRP surface and psum the partials.  On a machine without multiple
accelerators, force a virtual CPU mesh first:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        JAX_PLATFORMS=cpu python examples/sharded_mesh.py

On a pod slice, run one process per host with
``mcax.dist.multihost.initialize()`` and the same code spans all hosts.
"""

import jax
import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))   # runnable as `python examples/<x>.py`

from mcax.config import get_config
from mcax.dist import mesh as mesh_mod
from mcax.dist.sharded import ShardedPipeline

from localize import synthesize_scene


def main(nblocks: int = 4) -> float:
    cfg = get_config("config3")
    n_dev = len(jax.devices())
    ts, cs = mesh_mod.auto_factor(n_dev, cfg.array.num_mics)
    mesh = mesh_mod.make_mesh(ts, cs)
    print(f"mesh: {ts} time x {cs} channel shards over {n_dev} devices")
    pipe = ShardedPipeline(cfg, mesh)
    x = synthesize_scene(pipe.geom, np.deg2rad(-75.0),
                         cfg.block_len * nblocks)

    # throughput mode: all blocks in ONE dispatch, blocks sharded over 'time'
    blocks = x.reshape(pipe.geom.num_mics, nblocks, cfg.block_len)
    blocks = np.moveaxis(blocks, 1, 0)
    state = pipe.init_state()
    state, outs = pipe.process_blocks(state, blocks)
    doa = np.rad2deg(np.median(np.asarray(outs["doa"])))
    print(f"DOA over the mesh: {doa:+.2f} deg (true -75.00)")
    return float(doa)


if __name__ == "__main__":
    main()
