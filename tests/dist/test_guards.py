"""Replication-guard mode (SURVEY.md §5 guards; VERDICT.md round-1 weak 5).

MCAX_CHECK_VMA=1 turns on shard_map's static replication checking
(``check_vma=True``) and switches the data-path gathers to the
psum-invariant form (mcax.dist.collectives).  These tests (a) prove every
config's out-specs typecheck under the guard, and (b) pin the guarded
path's outputs to the production all-gather path bit-for-bit, so the guard
twin really validates production semantics.
"""

import jax
import numpy as np
import pytest

from mcax import config as cfg_mod
from mcax.dist import collectives as coll
from mcax.dist import mesh as mesh_mod
from mcax.dist.sharded import ShardedPipeline
from tests import helpers

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def _run_blocks(sp, x, nb, block_len):
    st = sp.init_state()
    outs = []
    for b in range(nb):
        st, out = sp.process_block(st, x[:, b * block_len:(b + 1) * block_len])
        outs.append(jax.tree_util.tree_map(np.asarray, out))
    return st, outs


@pytest.mark.parametrize("name,ts,cs,keys", [
    ("config1", 4, 2, ["tdoa", "peak"]),
    ("config3", 2, 4, ["doa", "power"]),
    ("config4", 2, 4, ["audio", "doa"]),
    ("config5", 2, 4, ["audio", "doa"]),
])
def test_guarded_matches_production(name, ts, cs, keys, monkeypatch):
    cfg = cfg_mod.get_config(name)
    g = cfg.geometry()
    nb = 2
    x = helpers.array_signals(g, np.deg2rad(31.0), cfg.block_len * nb, seed=6)
    mesh = mesh_mod.make_mesh(ts, cs)

    monkeypatch.delenv("MCAX_CHECK_VMA", raising=False)
    assert not coll.guard_enabled()
    _, prod = _run_blocks(ShardedPipeline(cfg, mesh, donate=False), x, nb,
                          cfg.block_len)

    monkeypatch.setenv("MCAX_CHECK_VMA", "1")
    assert coll.guard_enabled()
    _, guard = _run_blocks(ShardedPipeline(cfg, mesh, donate=False), x, nb,
                           cfg.block_len)

    # scatter+psum places each slice exactly once (0 + v == v), so the
    # guarded twin must be BIT-identical, not merely close
    for p, q in zip(prod, guard):
        for k in keys:
            np.testing.assert_array_equal(q[k], p[k], err_msg=k)


def test_guarded_batched_mode_typechecks(monkeypatch):
    monkeypatch.setenv("MCAX_CHECK_VMA", "1")
    cfg = cfg_mod.get_config("config4")
    sp = ShardedPipeline(cfg, mesh_mod.make_mesh(2, 4), donate=False)
    st = sp.init_state()
    x = np.random.default_rng(0).standard_normal(
        (2, 8, cfg.block_len)).astype(np.float32)
    st, out = sp.process_blocks(st, x)
    jax.block_until_ready(out)
    assert np.all(np.isfinite(np.asarray(out["audio"])))


def test_all_gather_invariant_matches_all_gather():
    """Unit parity of the invariant gather against lax.all_gather, both
    tiled and stacking forms."""
    from functools import partial
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import PartitionSpec as P

    mesh = mesh_mod.make_mesh(4, 2)
    x = np.arange(4 * 6 * 3, dtype=np.float32).reshape(4 * 6, 3)

    def body(xl):
        a = coll.all_gather_invariant(xl, "time", axis=0, tiled=True)
        b = lax.all_gather(xl, "time", axis=0, tiled=True)
        c = coll.all_gather_invariant(xl, "time", axis=0, tiled=False)
        d = lax.all_gather(xl, "time", axis=0, tiled=False)
        return a - b, c - d

    sm = jax.shard_map(body, mesh=mesh, in_specs=P("time", None),
                       out_specs=(P(None, None), P(None, None, None)),
                       check_vma=False)
    da, dc = sm(x)
    np.testing.assert_array_equal(np.asarray(da), 0.0)
    np.testing.assert_array_equal(np.asarray(dc), 0.0)
