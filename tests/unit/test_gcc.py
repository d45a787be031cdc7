import numpy as np
import pytest

from mcax import config as cfg_mod
from mcax import geometry as geo
from mcax.algos import gcc
from mcax.frames import stft as stft_mod
from mcax.frames import window as win_mod
from mcax.kernels import cps as kcps
from mcax.pipeline import Pipeline
from tests import helpers
from tests.oracle import oracle_np


def _stereo_geom(fs=16000, spacing=0.1):
    return geo.ArrayGeometry(positions=geo.linear_positions(2, spacing),
                             sample_rate=fs)


def test_cps_phat_matches_oracle():
    g = _stereo_geom()
    x = helpers.array_signals(g, np.deg2rad(30.0), 4096, seed=5)
    w = win_mod.hann(512)
    spec = helpers.run_planes(lambda xx: stft_mod.stft(xx, w, 256), x)
    got = helpers.run_planes(lambda sp: kcps.cps_phat(sp, g.pairs), spec)
    want = oracle_np.cps_phat(spec, g.pairs)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("az_deg", [-60.0, -20.0, 0.0, 35.0, 70.0])
def test_tdoa_recovers_injected_delay(az_deg):
    g = _stereo_geom()
    az = np.deg2rad(az_deg)
    x = helpers.array_signals(g, az, 8192, seed=7)
    w = win_mod.hann(512)
    plan = gcc.make_plan(g, 512)
    res = helpers.run_planes(
        lambda xx: gcc.gcc_phat_block(stft_mod.stft(xx, w, 256), g.pairs,
                                      plan), x)
    tdoa = np.asarray(res["tdoa"])[0]                      # [T]
    expected = g.pair_tdoas(np.asarray([az]))[0, 0]
    # median over frames, within a quarter sample
    assert abs(np.median(tdoa) - expected) < 0.25 / g.sample_rate
    # single-pair DOA is the angle off the baseline (+x): |az| for this array
    doa = np.asarray(res["doa"])[0]
    assert abs(np.median(doa) - abs(az)) < np.deg2rad(3.0)


def test_tdoa_matches_bruteforce_oracle():
    g = _stereo_geom()
    x = helpers.array_signals(g, np.deg2rad(25.0), 4096, seed=9)
    w = win_mod.hann(512)
    spec = helpers.run_planes(lambda xx: stft_mod.stft(xx, w, 256), x)
    plan = gcc.make_plan(g, 512)
    res = helpers.run_planes(
        lambda sp: gcc.gcc_phat_block(sp, g.pairs, plan), spec)
    got = np.asarray(res["tdoa"])
    want = oracle_np.gcc_phat_tdoa(spec, g.pairs, 512,
                                   g.max_lag_samples(), g.sample_rate)
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_config1_pipeline_end_to_end():
    cfg = cfg_mod.CONFIG1
    g = cfg.geometry()
    az = np.deg2rad(40.0)
    x = helpers.array_signals(g, az, 16384, seed=11)
    pipe = Pipeline(cfg)
    state, out = pipe.run(x)
    assert out["doa"].shape == (4, 1, cfg.frames_per_block)
    # ignore the first block (carry warm-up), use median over the rest;
    # single-pair DOA is the angle off the +x baseline: |az| here.
    doa = out["doa"][1:].reshape(-1)
    assert abs(np.median(doa) - abs(az)) < np.deg2rad(3.0)
    assert int(np.asarray(state.block_idx)) == 4


def test_config1_streaming_matches_oneshot():
    """Streamed blocks produce the same frame stream as one big block."""
    cfg = cfg_mod.CONFIG1
    g = cfg.geometry()
    x = helpers.array_signals(g, np.deg2rad(-15.0), 8192, seed=13)
    pipe = Pipeline(cfg, donate=False)
    _, out = pipe.run(x)
    streamed = out["tdoa"].reshape(-1)

    # one-shot: same zero carry prefix, all frames at once
    lh = cfg.stft.frame_len - cfg.stft.hop
    xp = np.concatenate([np.zeros((2, lh), np.float32), x], axis=-1)
    w = win_mod.hann(cfg.stft.frame_len)
    plan = gcc.make_plan(g, cfg.stft.frame_len)
    res = helpers.run_planes(
        lambda xx: gcc.gcc_phat_block(
            stft_mod.stft(xx, w, cfg.stft.hop), g.pairs, plan), xp)
    oneshot = np.asarray(res["tdoa"]).reshape(-1)
    np.testing.assert_allclose(streamed, oneshot[:len(streamed)], atol=1e-7)

def test_multiband_per_band_and_fused():
    """Sub-band GCC (dspone SubBandSTFT analogue): every band carrying
    source energy recovers the injected TDOA; the confidence-weighted
    fusion matches the full-band estimate within a quarter sample."""
    g = _stereo_geom()
    az = np.deg2rad(40.0)
    x = helpers.array_signals(g, az, 8192, seed=11)
    w = win_mod.hann(512)
    plan = gcc.make_plan(g, 512)
    masks = gcc.multiband_masks(512, g.sample_rate, num_bands=6, scale="mel")
    assert masks.shape == (6, 257)
    res = helpers.run_planes(
        lambda xx: gcc.gcc_phat_multiband(
            stft_mod.stft(xx, w, 256), g.pairs, plan, masks), x)
    expected = g.pair_tdoas(np.asarray([az]))[0, 0]
    tau_b = np.asarray(res["tdoa"])                         # [B, P, T]
    peak_b = np.asarray(res["peak"])
    # bands fully inside the source's band-limit (0.9 Nyquist) and wide
    # enough to disambiguate the peak recover the delay; the top mel band
    # is partially empty and narrow (sidelobe-ambiguous), so skip it
    for b in range(5):
        med = np.median(tau_b[b, 0])
        assert abs(med - expected) < 0.5 / g.sample_rate, (b, med, expected)
    fused = np.median(np.asarray(res["tdoa_fused"])[0])
    assert abs(fused - expected) < 0.25 / g.sample_rate
    assert np.all(peak_b >= -1.0)


def test_multiband_empty_band_gets_no_weight():
    """A band above the source's band-limit has ~zero peak confidence and
    must not corrupt the fused estimate."""
    g = _stereo_geom()
    az = np.deg2rad(-20.0)
    # band-limit the source to 0.4 Nyquist = 3.2 kHz
    x = helpers.array_signals(g, az, 8192, seed=13, bandlimit=0.4)
    w = win_mod.hann(512)
    plan = gcc.make_plan(g, 512)
    masks = gcc.multiband_masks(512, g.sample_rate, num_bands=4,
                                scale="linear", fmin=0.0)
    res = helpers.run_planes(
        lambda xx: gcc.gcc_phat_multiband(
            stft_mod.stft(xx, w, 256), g.pairs, plan, masks), x)
    peak_b = np.asarray(res["peak"])                        # [B, P, T]
    # top linear band (6-8 kHz) is empty: its mean confidence must be far
    # below the occupied bottom band's
    assert peak_b[3].mean() < 0.3 * peak_b[0].mean()
    # a 3.2 kHz-limited source gives a coarse correlation peak: within one
    # sample is the realistic bound here
    expected = g.pair_tdoas(np.asarray([az]))[0, 0]
    fused = np.median(np.asarray(res["tdoa_fused"])[0])
    assert abs(fused - expected) < 1.0 / g.sample_rate
