"""Pallas async remote-DMA halo exchange vs the ppermute path (C13).

On CPU the kernel runs under Pallas TPU interpret emulation, which models
the per-device remote copies faithfully on the forced 8-device mesh — so
these tests validate the real kernel logic (neighbor addressing, semaphore
pairing, payload layout), not a stub.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax.sharding import PartitionSpec as P

from mcax import config as cfg_mod
from mcax.dist import halo as halo_mod
from mcax.dist import halo_rdma
from mcax.dist import mesh as mesh_mod
from mcax.dist.sharded import ShardedPipeline
from mcax.pipeline import Pipeline
from tests import helpers

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def test_ring_push_right_matches_ppermute():
    mesh = mesh_mod.make_mesh(4, 2)
    x = np.arange(4 * 2 * 3 * 128, dtype=np.float32).reshape(4 * 3, 2 * 128)

    def body(xl):
        ring = halo_rdma.ring_push_right(xl, "time")
        perm = lax.ppermute(xl, "time",
                            [(i, (i + 1) % 4) for i in range(4)])
        return ring - perm

    sm = jax.shard_map(body, mesh=mesh, in_specs=P("time", "channel"),
                       out_specs=P("time", "channel"), check_vma=False)
    np.testing.assert_array_equal(np.asarray(sm(x)), 0.0)


def test_ring_push_right_channel_axis_held_fixed():
    """The ring runs along 'time'; each channel shard must receive from the
    SAME channel position (flat-logical neighbor math)."""
    mesh = mesh_mod.make_mesh(4, 2)
    x = np.zeros((4, 2 * 128), np.float32)

    def body(_):
        ti = lax.axis_index("time").astype(jnp.float32)
        ci = lax.axis_index("channel").astype(jnp.float32)
        payload = jnp.full((1, 128), 10.0 * ti + ci)
        return halo_rdma.ring_push_right(payload, "time")

    sm = jax.shard_map(body, mesh=mesh, in_specs=P("time", "channel"),
                       out_specs=P("time", "channel"), check_vma=False)
    out = np.asarray(sm(x))                       # [4, 256]
    got = out.reshape(4, 2, 128)[:, :, 0]         # [time, channel]
    want = np.array([[30.0, 31.0], [0.0, 1.0], [10.0, 11.0], [20.0, 21.0]])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("name,ts,cs,keys", [
    ("config2", 4, 2, ["audio"]),
    ("config4", 2, 4, ["audio", "doa"]),
])
def test_rdma_halo_pipeline_parity(name, ts, cs, keys, monkeypatch):
    """Full sharded pipelines with MCAX_HALO=rdma reproduce the
    single-device pipeline (both scan and streaming carry seams)."""
    monkeypatch.setenv("MCAX_HALO", "rdma")
    cfg = cfg_mod.get_config(name)
    g = cfg.geometry()
    nb = 3
    x = helpers.array_signals(g, np.deg2rad(24.0), cfg.block_len * nb, seed=8)
    ref_pipe = Pipeline(cfg, donate=False)
    st_r = ref_pipe.init_state()
    sp = ShardedPipeline(cfg, mesh_mod.make_mesh(ts, cs), donate=False)
    st_s = sp.init_state()
    for b in range(nb):
        blk = x[:, b * cfg.block_len:(b + 1) * cfg.block_len]
        st_r, out_r = ref_pipe.process_block(st_r, blk)
        st_s, out_s = sp.process_block(st_s, blk)
        for k in keys:
            np.testing.assert_allclose(np.asarray(out_s[k]),
                                       np.asarray(out_r[k]),
                                       rtol=3e-5, atol=1e-4, err_msg=k)
    np.testing.assert_allclose(np.asarray(st_s.carry),
                               np.asarray(st_r.carry), atol=1e-6)
    if st_r.ola_tail is not None:
        np.testing.assert_allclose(np.asarray(st_s.ola_tail),
                                   np.asarray(st_r.ola_tail), atol=1e-4)
