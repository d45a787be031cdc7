"""End-to-end pipeline tests: streaming invariance, checkpoint/resume
bit-parity, per-config behavior (SURVEY.md §4.2, §5)."""

import dataclasses
import os

import numpy as np
import pytest

from mcax import config as cfg_mod
from mcax.pipeline import Pipeline
from mcax.utils import checkpoint as ckpt
from tests import helpers


def _run(pipe, x, cfg, start=0, state=None, nblocks=None):
    state = pipe.init_state() if state is None else state
    n = x.shape[1] // cfg.block_len if nblocks is None else nblocks
    outs = []
    for b in range(start, n):
        state, out = pipe.process_block(
            state, x[:, b * cfg.block_len:(b + 1) * cfg.block_len])
        outs.append({k: np.asarray(v) for k, v in out.items()})
    return state, outs


def test_streaming_equals_offline_ola():
    """Block-streamed synthesis output bit-matches one big-block run
    (the streaming OLA tail + input carry are exact)."""
    cfg = cfg_mod.get_config("config2")
    g = cfg.geometry()
    x = helpers.array_signals(g, np.pi / 2, cfg.block_len * 4, seed=5)
    _, outs = _run(Pipeline(cfg, donate=False), x, cfg)
    streamed = np.concatenate([o["audio"] for o in outs], axis=-1)

    big = dataclasses.replace(cfg, block_len=cfg.block_len * 4)
    _, outs_big = _run(Pipeline(big, donate=False), x, big)
    offline = outs_big[0]["audio"]
    np.testing.assert_allclose(streamed, offline, atol=1e-5)


def test_checkpoint_resume_bit_identical(tmp_path):
    cfg = cfg_mod.get_config("config4")
    g = cfg.geometry()
    x = helpers.array_signals(g, np.deg2rad(25.0), cfg.block_len * 4, seed=6)
    pipe = Pipeline(cfg, donate=False)

    _, outs_full = _run(pipe, x, cfg)

    # run 2 blocks, snapshot, restore into a fresh state, run the rest
    state, _ = _run(pipe, x, cfg, nblocks=2)
    path = os.path.join(tmp_path, "ck.npz")
    ckpt.save(path, state, cfg.config_hash(), sample_cursor=2 * cfg.block_len)
    restored, cursor, _ = ckpt.load(path, pipe.init_state(), cfg.config_hash())
    assert cursor == 2 * cfg.block_len
    _, outs_resumed = _run(pipe, x, cfg, start=2, state=restored)

    for a, b in zip(outs_full[2:], outs_resumed):
        np.testing.assert_array_equal(a["audio"], b["audio"])


def test_checkpoint_rejects_config_mismatch(tmp_path):
    cfg = cfg_mod.get_config("config1")
    pipe = Pipeline(cfg)
    path = os.path.join(tmp_path, "ck.npz")
    ckpt.save(path, pipe.init_state(), cfg.config_hash())
    other = cfg_mod.get_config("config1")
    other = dataclasses.replace(other, algo=dataclasses.replace(
        other.algo, phat_eps=1e-9))
    with pytest.raises(ValueError, match="hash"):
        ckpt.load(path, pipe.init_state(), other.config_hash())


def test_config3_tracks_static_source():
    cfg = cfg_mod.get_config("config3")
    g = cfg.geometry()
    x = helpers.array_signals(g, np.deg2rad(-45.0), cfg.block_len * 3, seed=7)
    _, outs = _run(Pipeline(cfg), x, cfg)
    doa = np.concatenate([o["doa"] for o in outs])
    est = np.rad2deg(np.median(doa[4:]))
    assert abs(est + 45.0) < 1.5, est


def test_config5_tracks_two_sources():
    cfg = cfg_mod.get_config("config5")
    g = cfg.geometry()
    x = helpers.moving_sources(g, [np.deg2rad(-60.0), np.deg2rad(60.0)],
                               [np.deg2rad(-60.0), np.deg2rad(60.0)],
                               cfg.block_len * 6, cfg.block_len, seed=8,
                               noise_db=-30.0)
    state, outs = _run(Pipeline(cfg, donate=False), x, cfg)
    final = np.sort(np.rad2deg(np.asarray(outs[-1]["doa"])))
    np.testing.assert_allclose(final, [-60.0, 60.0], atol=5.0)
    assert outs[-1]["audio"].shape[0] == 2          # per-source extraction


def test_wrong_block_shape_raises():
    cfg = cfg_mod.get_config("config1")
    pipe = Pipeline(cfg)
    with pytest.raises(ValueError, match="expected samples"):
        pipe.process_block(pipe.init_state(),
                           np.zeros((2, cfg.block_len + 1), np.float32))


def test_mask_pipeline_attenuates_off_target():
    """Binaural mask keeps a broadside source, attenuates an off-axis one."""
    base = cfg_mod.get_config("config1")
    cfg = dataclasses.replace(
        base,
        stft=dataclasses.replace(base.stft, synthesis=True),
        algo=dataclasses.replace(base.algo, name="mask",
                                 steer_azimuth_rad=np.pi / 2))
    g = cfg.geometry()
    on = helpers.array_signals(g, np.pi / 2, cfg.block_len * 2, seed=9,
                               noise_db=-60.0)
    off = helpers.array_signals(g, np.deg2rad(15.0), cfg.block_len * 2,
                                seed=10, noise_db=-60.0)
    pipe = Pipeline(cfg, donate=False)
    _, o_on = _run(pipe, on, cfg)
    _, o_off = _run(pipe, off, cfg)
    e_on = sum(float((o["audio"] ** 2).sum()) for o in o_on)
    e_off = sum(float((o["audio"] ** 2).sum()) for o in o_off)
    assert e_on > 4.0 * e_off, (e_on, e_off)


def test_srp_delaysum_steers_to_source():
    """SRP-steered delay-sum (C7 'SRP-steered'): localises then beamforms."""
    base = cfg_mod.get_config("config3")
    cfg = dataclasses.replace(
        base,
        stft=dataclasses.replace(base.stft, synthesis=True),
        algo=dataclasses.replace(base.algo, name="srp_delaysum"))
    g = cfg.geometry()
    x = helpers.array_signals(g, np.deg2rad(75.0), cfg.block_len * 2, seed=11)
    pipe = Pipeline(cfg, donate=False)
    st = pipe.init_state()
    for b in range(2):
        st, out = pipe.process_block(st, x[:, b * cfg.block_len:(b + 1) * cfg.block_len])
    assert abs(np.rad2deg(float(out["doa"])) - 75.0) < 2.0
    assert np.isfinite(np.asarray(out["audio"])).all()


def test_srp_delaysum_sharded_parity():
    import jax as _jax
    if len(_jax.devices()) < 4:
        return
    from mcax.dist import mesh as mesh_mod
    from mcax.dist.sharded import ShardedPipeline
    base = cfg_mod.get_config("config3")
    cfg = dataclasses.replace(
        base,
        stft=dataclasses.replace(base.stft, synthesis=True),
        algo=dataclasses.replace(base.algo, name="srp_delaysum"))
    g = cfg.geometry()
    x = helpers.array_signals(g, np.deg2rad(-15.0), cfg.block_len * 2, seed=12)
    ref = Pipeline(cfg, donate=False)
    sp = ShardedPipeline(cfg, mesh_mod.make_mesh(2, 2), donate=False)
    s1, s2 = ref.init_state(), sp.init_state()
    for b in range(2):
        blk = x[:, b * cfg.block_len:(b + 1) * cfg.block_len]
        s1, o1 = ref.process_block(s1, blk)
        s2, o2 = sp.process_block(s2, blk)
    np.testing.assert_allclose(np.asarray(o2["audio"]), np.asarray(o1["audio"]),
                               rtol=3e-5, atol=1e-4)
    np.testing.assert_allclose(float(o2["doa"]), float(o1["doa"]), atol=1e-6)

def test_gcc_multiband_pipeline():
    """gcc_bands config: the fused multiband DOA stream matches the
    injected azimuth (pipeline-level wiring of gcc_phat_multiband)."""
    import jax.numpy as jnp
    base = cfg_mod.get_config("config1")
    cfg = dataclasses.replace(
        base, algo=dataclasses.replace(base.algo, gcc_bands=5))
    pipe = Pipeline(cfg, jit=False)
    g = pipe.geom
    az = np.deg2rad(55.0)
    x = helpers.array_signals(g, az, cfg.block_len * 3, seed=21)
    state = pipe.init_state()
    doas = []
    for b in range(3):
        state, out = pipe._block_step(
            state, jnp.asarray(x[:, b*cfg.block_len:(b+1)*cfg.block_len]))
        assert out["tdoa_band"].shape[0] == 5
        assert out["peak"].shape == out["tdoa"].shape
        doas.append(np.asarray(out["doa"]))
    est = np.rad2deg(np.median(np.concatenate(doas, axis=-1)[0, 4:]))
    assert abs(est - 55.0) < 3.0, est
