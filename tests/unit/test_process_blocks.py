"""process_blocks (lax.scan throughput mode) bit-matches the block loop."""

import numpy as np
import pytest

from mcax import config as cfg_mod
from mcax.pipeline import Pipeline
from tests import helpers


@pytest.mark.parametrize("name,key", [("config1", "tdoa"),
                                      ("config3", "doa"),
                                      ("config4", "audio")])
def test_scan_matches_loop(name, key):
    cfg = cfg_mod.get_config(name)
    g = cfg.geometry()
    nb = 3
    x = helpers.array_signals(g, np.deg2rad(20.0), cfg.block_len * nb, seed=0)
    blocks = x.reshape(g.num_mics, nb, cfg.block_len).transpose(1, 0, 2)

    pipe = Pipeline(cfg, donate=False)
    st = pipe.init_state()
    loop_outs = []
    for b in range(nb):
        st, out = pipe.process_block(st, blocks[b])
        loop_outs.append(np.asarray(out[key]))

    st2 = pipe.init_state()
    st2, outs = pipe.process_blocks(st2, blocks)
    scanned = np.asarray(outs[key])
    assert scanned.shape[0] == nb
    for b in range(nb):
        np.testing.assert_allclose(scanned[b], loop_outs[b], atol=2e-5,
                                   rtol=2e-5)
    np.testing.assert_allclose(np.asarray(st2.carry), np.asarray(st.carry),
                               atol=1e-6)


def test_scan_shape_validation():
    cfg = cfg_mod.get_config("config1")
    pipe = Pipeline(cfg)
    with pytest.raises(ValueError, match="expected samples"):
        pipe.process_blocks(pipe.init_state(),
                            np.zeros((2, cfg.block_len), np.float32))


def test_streams_match_independent_runs():
    """vmap multi-stream (DP) equals running each stream separately."""
    cfg = cfg_mod.get_config("config3")
    g = cfg.geometry()
    s = 3
    xs = np.stack([helpers.array_signals(g, np.deg2rad(a), cfg.block_len,
                                         seed=i)
                   for i, a in enumerate([-50.0, 10.0, 120.0])])
    pipe = Pipeline(cfg, donate=False)
    states = pipe.init_states(s)
    states, outs = pipe.process_streams(states, xs)
    assert np.asarray(outs["doa"]).shape[0] == s
    for i, a in enumerate([-50.0, 10.0, 120.0]):
        st1 = pipe.init_state()
        _, o1 = pipe.process_block(st1, xs[i])
        np.testing.assert_allclose(np.asarray(outs["doa"])[i],
                                   np.asarray(o1["doa"]), atol=1e-6)
        est = np.rad2deg(np.median(np.asarray(outs["doa"])[i]))
        assert abs((est - a + 180.0) % 360.0 - 180.0) < 2.0


def test_streams_shape_validation():
    cfg = cfg_mod.get_config("config1")
    pipe = Pipeline(cfg)
    with pytest.raises(ValueError, match="expected samples"):
        pipe.process_streams(pipe.init_states(2),
                             np.zeros((2, cfg.block_len), np.float32))


@pytest.mark.parametrize("name,key,tol", [
    ("config1", "tdoa", 1e-6),
    ("config2", "audio", 2e-5),
    ("config3", "doa", 1e-6),
    ("config4", "audio", 5e-4),
    ("config5", "audio", 5e-4),
])
def test_batched_matches_scan(name, key, tol):
    """Batched throughput mode (one fused B*T-frame step) matches the
    per-block lax.scan reference mode for every config.  MVDR configs get a
    looser bound: the covariance prefix is built by the associative monoid
    (reassociated float sums) and then amplified through the solve."""
    cfg = cfg_mod.get_config(name)
    g = cfg.geometry()
    nb = 4
    x = helpers.array_signals(g, np.deg2rad(35.0), cfg.block_len * nb, seed=2)
    blocks = x.reshape(g.num_mics, nb, cfg.block_len).transpose(1, 0, 2)

    ref = Pipeline(cfg, donate=False, scan_mode="scan")
    st1 = ref.init_state()
    st1, out_scan = ref.process_blocks(st1, blocks)

    bat = Pipeline(cfg, donate=False, scan_mode="batched")
    st2 = bat.init_state()
    st2, out_bat = bat.process_blocks(st2, blocks)

    a, r = np.asarray(out_scan[key]), np.asarray(out_bat[key])
    assert a.shape == r.shape, (a.shape, r.shape)
    np.testing.assert_allclose(r, a, atol=tol, rtol=tol)
    np.testing.assert_array_equal(np.asarray(st2.carry), np.asarray(st1.carry))
    np.testing.assert_equal(int(st2.block_idx), int(st1.block_idx))
    if st1.cov is not None:
        np.testing.assert_allclose(np.asarray(st2.cov), np.asarray(st1.cov),
                                   atol=1e-4, rtol=1e-4)
    if st1.ola_tail is not None:
        np.testing.assert_allclose(np.asarray(st2.ola_tail),
                                   np.asarray(st1.ola_tail),
                                   atol=tol, rtol=tol)
    if st1.tracks is not None:
        np.testing.assert_allclose(np.asarray(st2.tracks.angles_rad),
                                   np.asarray(st1.tracks.angles_rad),
                                   atol=1e-5)


def test_batched_matches_scan_particle_smoother():
    """config5 with the particle smoother: the fused batched mode reproduces
    the per-block scan mode (same PRNG stream — the particle carry scans in
    block order in both modes)."""
    import dataclasses
    cfg = cfg_mod.get_config("config5")
    cfg = dataclasses.replace(
        cfg, algo=dataclasses.replace(cfg.algo, smoother="particle",
                                      num_particles=128))
    g = cfg.geometry()
    nb = 4
    x = helpers.moving_sources(
        g, [np.deg2rad(-60.0), np.deg2rad(50.0)],
        [np.deg2rad(-30.0), np.deg2rad(80.0)],
        cfg.block_len * nb, cfg.block_len, seed=2)
    blocks = x.reshape(g.num_mics, nb, cfg.block_len).transpose(1, 0, 2)

    ref = Pipeline(cfg, donate=False, scan_mode="scan")
    st1 = ref.init_state()
    st1, out_scan = ref.process_blocks(st1, blocks)

    bat = Pipeline(cfg, donate=False, scan_mode="batched")
    st2 = bat.init_state()
    st2, out_bat = bat.process_blocks(st2, blocks)

    np.testing.assert_allclose(np.asarray(out_bat["doa"]),
                               np.asarray(out_scan["doa"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_bat["audio"]),
                               np.asarray(out_scan["audio"]),
                               atol=5e-4, rtol=5e-4)
    assert st1.particles is not None and st2.particles is not None
    np.testing.assert_array_equal(np.asarray(st2.particles.key),
                                  np.asarray(st1.particles.key))
    np.testing.assert_allclose(np.asarray(st2.particles.angles),
                               np.asarray(st1.particles.angles), atol=1e-4)
