"""Sharded-vs-single-device parity on the forced 8-device CPU mesh
(SURVEY.md §4.2.3): every collective path — time halo, channel all-gather,
pair psum, covariance monoid combine, OLA spill exchange — must reproduce
the single-device pipeline to float-reassociation tolerance, for every
config and several mesh factorizations."""

import dataclasses

import jax
import numpy as np
import pytest

from mcax import config as cfg_mod
from mcax.dist import mesh as mesh_mod
from mcax.dist.sharded import ShardedPipeline
from mcax.pipeline import Pipeline
from tests import helpers

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def _run(pipe, x, nblocks, block_len):
    state = pipe.init_state()
    outs = []
    for b in range(nblocks):
        state, out = pipe.process_block(state, x[:, b * block_len:(b + 1) * block_len])
        outs.append(jax.tree_util.tree_map(np.asarray, out))
    return state, outs


def _assert_close(ref_outs, got_outs, keys, atol):
    for r, g in zip(ref_outs, got_outs):
        assert set(r) == set(g)
        for k in keys:
            np.testing.assert_allclose(g[k], r[k], rtol=3e-5, atol=atol,
                                       err_msg=k)


def _signal_for(cfg, nblocks, seed=0):
    g = cfg.geometry()
    if cfg.algo.name == "track_mvdr":
        return helpers.moving_sources(
            g, [np.deg2rad(-60.0), np.deg2rad(50.0)],
            [np.deg2rad(-30.0), np.deg2rad(80.0)],
            cfg.block_len * nblocks, cfg.block_len, seed=seed)
    return helpers.array_signals(g, np.deg2rad(37.0),
                                 cfg.block_len * nblocks, seed=seed)


CASES = [
    # (config, time_shards, channel_shards, out keys to compare, atol)
    ("config1", 4, 2, ["tdoa", "peak"], 1e-5),
    ("config1", 8, 1, ["tdoa", "peak"], 1e-5),
    ("config2", 4, 2, ["audio"], 1e-5),
    ("config3", 2, 4, ["doa", "power"], 2e-4),
    ("config3", 4, 2, ["doa", "power"], 2e-4),
    ("config4", 2, 4, ["audio", "doa"], 1e-4),
    ("config5", 2, 4, ["audio", "doa", "confidence"], 5e-4),
]


@pytest.mark.parametrize("name,ts,cs,keys,atol", CASES)
def test_sharded_matches_single_device(name, ts, cs, keys, atol):
    cfg = cfg_mod.get_config(name)
    nblocks = 3
    x = _signal_for(cfg, nblocks)
    ref_state, ref_outs = _run(Pipeline(cfg, donate=False), x, nblocks,
                               cfg.block_len)
    mesh = mesh_mod.make_mesh(ts, cs)
    sp = ShardedPipeline(cfg, mesh, donate=False)
    got_state, got_outs = _run(sp, x, nblocks, cfg.block_len)
    _assert_close(ref_outs, got_outs, keys, atol)
    np.testing.assert_allclose(np.asarray(got_state.carry),
                               np.asarray(ref_state.carry), atol=1e-6)
    if ref_state.ola_tail is not None:
        np.testing.assert_allclose(np.asarray(got_state.ola_tail),
                                   np.asarray(ref_state.ola_tail), atol=atol)
    if ref_state.cov is not None:
        np.testing.assert_allclose(np.asarray(got_state.cov),
                                   np.asarray(ref_state.cov), rtol=3e-5,
                                   atol=atol)


def test_sharded_75pct_overlap_matches_single_device():
    """Non-default hop (75% overlap → 3 halo frames per shard boundary)
    through the whole distributed chain: halo exchange, overlapped STFT,
    pair psum, OLA spill all must stay exact when halo_len > hop."""
    cfg = cfg_mod.get_config("config2")
    cfg = dataclasses.replace(
        cfg, stft=dataclasses.replace(cfg.stft, hop=128))
    nblocks = 3
    x = _signal_for(cfg, nblocks)
    ref_state, ref_outs = _run(Pipeline(cfg, donate=False), x, nblocks,
                               cfg.block_len)
    sp = ShardedPipeline(cfg, mesh_mod.make_mesh(4, 2), donate=False)
    got_state, got_outs = _run(sp, x, nblocks, cfg.block_len)
    _assert_close(ref_outs, got_outs, ["audio"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_state.ola_tail),
                               np.asarray(ref_state.ola_tail), atol=1e-5)


def test_sharded_fused_srp_matches_single_device(monkeypatch):
    """The fused single-pass SRP kernel under shard_map (pair slice via
    scalar prefetch, valid column masking the pad pairs) reproduces the
    materialised-CPS reference — on a 1x8 mesh so P=28 pads to 32 and the
    masking is actually exercised (VERDICT round-2 missing item 2)."""
    cfg = cfg_mod.get_config("config3")
    nblocks = 2
    x = _signal_for(cfg, nblocks)
    ref_state, ref_outs = _run(Pipeline(cfg, donate=False), x, nblocks,
                               cfg.block_len)
    monkeypatch.setenv("MCAX_SRP", "fused")
    monkeypatch.setenv("MCAX_PALLAS_INTERPRET", "1")
    sp = ShardedPipeline(cfg, mesh_mod.make_mesh(1, 8), donate=False)
    assert sp._srp_fused
    got_state, got_outs = _run(sp, x, nblocks, cfg.block_len)
    _assert_close(ref_outs, got_outs, ["doa", "power"], atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_state.carry),
                               np.asarray(ref_state.carry), atol=1e-6)


def test_sharded_fused_srp_batched_mode(monkeypatch):
    """Fused SRP in the BATCHED throughput mode (the production scale-out
    path) on a 2x4 mesh, config5's 16-mic/120-pair tracking chain."""
    cfg = cfg_mod.get_config("config5")
    nblocks = 2
    x = _signal_for(cfg, nblocks)
    blocks = np.stack([x[:, b * cfg.block_len:(b + 1) * cfg.block_len]
                       for b in range(nblocks)])
    ref_pipe = Pipeline(cfg, donate=False)
    ref_st, ref_outs = ref_pipe.process_blocks(ref_pipe.init_state(), blocks)
    ref_outs = jax.tree_util.tree_map(np.asarray, ref_outs)
    monkeypatch.setenv("MCAX_SRP", "fused")
    monkeypatch.setenv("MCAX_PALLAS_INTERPRET", "1")
    sp = ShardedPipeline(cfg, mesh_mod.make_mesh(2, 4), donate=False)
    assert sp._srp_fused
    got_st, got_outs = sp.process_blocks(sp.init_state(), blocks)
    for k in ("audio", "doa", "confidence"):
        np.testing.assert_allclose(np.asarray(got_outs[k]), ref_outs[k],
                                   rtol=3e-5, atol=5e-4, err_msg=k)


def test_sharded_fused_cov_batched_mode(monkeypatch):
    """The fused covariance-prefix Pallas kernel dispatched INSIDE
    shard_map (block_covs path): the xla einsum there needed a vma
    workaround (covariance.py block_prefixes init), so the pallas_call's
    behavior under shard_map gets its own interpret-mode coverage
    (ADVICE round 3, low #5)."""
    cfg = cfg_mod.get_config("config4")
    nblocks = 2
    x = _signal_for(cfg, nblocks)
    blocks = np.stack([x[:, b * cfg.block_len:(b + 1) * cfg.block_len]
                       for b in range(nblocks)])
    monkeypatch.setenv("MCAX_COV", "xla")
    ref_pipe = Pipeline(cfg, donate=False)
    ref_st, ref_outs = ref_pipe.process_blocks(ref_pipe.init_state(), blocks)
    ref_outs = jax.tree_util.tree_map(np.asarray, ref_outs)
    monkeypatch.setenv("MCAX_COV", "fused")
    monkeypatch.setenv("MCAX_PALLAS_INTERPRET", "1")
    sp = ShardedPipeline(cfg, mesh_mod.make_mesh(2, 4), donate=False)
    got_st, got_outs = sp.process_blocks(sp.init_state(), blocks)
    for k in ("audio", "doa"):
        np.testing.assert_allclose(np.asarray(got_outs[k]), ref_outs[k],
                                   rtol=3e-5, atol=1e-4, err_msg=k)
    np.testing.assert_allclose(np.asarray(got_st.cov),
                               np.asarray(ref_st.cov), rtol=3e-5, atol=1e-4)


def test_sharded_fused_mvdr_batched_mode(monkeypatch):
    """The fused MVDR weight-solve kernel dispatched inside shard_map's
    frequency-sharded chain (mvdr_beamform), interpret mode."""
    cfg = cfg_mod.get_config("config4")
    nblocks = 2
    x = _signal_for(cfg, nblocks)
    blocks = np.stack([x[:, b * cfg.block_len:(b + 1) * cfg.block_len]
                       for b in range(nblocks)])
    monkeypatch.setenv("MCAX_MVDR", "xla")
    ref_pipe = Pipeline(cfg, donate=False)
    ref_st, ref_outs = ref_pipe.process_blocks(ref_pipe.init_state(), blocks)
    ref_outs = jax.tree_util.tree_map(np.asarray, ref_outs)
    monkeypatch.setenv("MCAX_MVDR", "fused")
    monkeypatch.setenv("MCAX_PALLAS_INTERPRET", "1")
    sp = ShardedPipeline(cfg, mesh_mod.make_mesh(2, 4), donate=False)
    got_st, got_outs = sp.process_blocks(sp.init_state(), blocks)
    for k in ("audio", "doa"):
        np.testing.assert_allclose(np.asarray(got_outs[k]), ref_outs[k],
                                   rtol=3e-5, atol=2e-4, err_msg=k)


def test_sharded_multiband_gcc_matches_single_device():
    """Multiband GCC in the sharded per-block (scan) step: the round-1
    silent fork (scan mode dropped algo.gcc_bands) is closed — both modes
    of ShardedPipeline now run the same multiband math as Pipeline."""
    cfg = cfg_mod.get_config("config1")
    cfg = dataclasses.replace(
        cfg, algo=dataclasses.replace(cfg.algo, gcc_bands=4))
    nblocks = 2
    x = _signal_for(cfg, nblocks)
    ref_state, ref_outs = _run(Pipeline(cfg, donate=False), x, nblocks,
                               cfg.block_len)
    sp = ShardedPipeline(cfg, mesh_mod.make_mesh(4, 2), donate=False)
    got_state, got_outs = _run(sp, x, nblocks, cfg.block_len)
    _assert_close(ref_outs, got_outs,
                  ["tdoa", "doa", "tdoa_band", "peak_band", "peak"],
                  atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_state.carry),
                               np.asarray(ref_state.carry), atol=1e-6)


def test_sharded_particle_smoother_matches_single_device():
    """config5 with the particle smoother: replicated clouds + identical
    PRNG streams ⇒ the sharded pipeline reproduces the single-device one."""
    cfg = cfg_mod.get_config("config5")
    cfg = dataclasses.replace(
        cfg, algo=dataclasses.replace(cfg.algo, smoother="particle",
                                      num_particles=128))
    nblocks = 3
    x = _signal_for(cfg, nblocks)
    ref_state, ref_outs = _run(Pipeline(cfg, donate=False), x, nblocks,
                               cfg.block_len)
    sp = ShardedPipeline(cfg, mesh_mod.make_mesh(2, 4), donate=False)
    got_state, got_outs = _run(sp, x, nblocks, cfg.block_len)
    _assert_close(ref_outs, got_outs, ["audio", "doa", "confidence"],
                  atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_state.particles.angles),
                               np.asarray(ref_state.particles.angles),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got_state.particles.key),
                                  np.asarray(ref_state.particles.key))


def test_srp_doa_correct_on_mesh():
    """End-to-end: the sharded SRP grid still finds the injected source."""
    cfg = cfg_mod.get_config("config3")
    g = cfg.geometry()
    x = helpers.array_signals(g, np.deg2rad(-120.0), cfg.block_len * 2, seed=4)
    mesh = mesh_mod.make_mesh(4, 2)
    sp = ShardedPipeline(cfg, mesh)
    st = sp.init_state()
    for b in range(2):
        st, out = sp.process_block(st, x[:, b * cfg.block_len:(b + 1) * cfg.block_len])
    est = np.rad2deg(np.median(np.asarray(out["doa"])))
    assert abs(est - (-120.0)) < 2.0, est


def test_mesh_validation():
    cfg = cfg_mod.get_config("config3")          # 8 mics
    mesh = mesh_mod.make_mesh(1, 8)
    ShardedPipeline(cfg, mesh)                   # 8 % 8 == 0: ok
    cfg2 = cfg_mod.get_config("config1")         # 2 mics
    with pytest.raises(ValueError):
        ShardedPipeline(cfg2, mesh_mod.make_mesh(2, 4))

    with pytest.raises(ValueError):              # wrong block shape
        sp = ShardedPipeline(cfg, mesh_mod.make_mesh(2, 2))
        sp.process_block(sp.init_state(),
                         np.zeros((8, cfg.block_len + 1), np.float32))


def test_auto_factor():
    assert mesh_mod.auto_factor(8, 8) == (2, 4)
    assert mesh_mod.auto_factor(8, 2) == (8, 1)
    assert mesh_mod.auto_factor(4, 16) == (1, 4)
    assert mesh_mod.auto_factor(1, 8) == (1, 1)


def test_sharded_scan_mode_matches_loop():
    cfg = cfg_mod.get_config("config3")
    g = cfg.geometry()
    nb = 2
    x = helpers.array_signals(g, np.deg2rad(65.0), cfg.block_len * nb, seed=9)
    blocks = x.reshape(g.num_mics, nb, cfg.block_len).transpose(1, 0, 2)
    sp = ShardedPipeline(cfg, mesh_mod.make_mesh(2, 2), donate=False)
    st = sp.init_state()
    loop = []
    for b in range(nb):
        st, out = sp.process_block(st, blocks[b])
        loop.append(np.asarray(out["doa"]))
    st2 = sp.init_state()
    st2, outs = sp.process_blocks(st2, blocks)
    for b in range(nb):
        np.testing.assert_allclose(np.asarray(outs["doa"])[b], loop[b],
                                   atol=1e-6)
