"""Sub-band (band-limited) GCC/SRP — the dspone SubBandSTFT analogue."""

import dataclasses

import numpy as np

from mcax import config as cfg_mod
from mcax import geometry as geo
from mcax.algos import gcc, srp
from mcax.frames import stft as stft_mod
from mcax.frames import window as win_mod
from mcax.pipeline import Pipeline
from tests import helpers


def test_band_bins_mask():
    m = srp.band_bins(512, 16000.0, (500.0, 3000.0))
    freqs = 16000.0 * np.arange(257) / 512
    np.testing.assert_array_equal(m, (freqs >= 500.0) & (freqs <= 3000.0))
    assert srp.band_bins(512, 16000.0, None).all()


def test_banded_srp_equals_masked_fullband():
    g = geo.ArrayGeometry(positions=geo.circular_positions(8, 0.05),
                          sample_rate=16000)
    x = helpers.array_signals(g, np.deg2rad(55.0), 4096, seed=0)
    spec = helpers.run_planes(
        lambda xx: stft_mod.stft(xx, win_mod.hann(512), 256), x)
    band = (300.0, 4000.0)
    plan_b = srp.make_plan(g, 512, 72, band_hz=band)
    power_b = helpers.run_planes(
        lambda sp: srp.srp_surface(sp, g.pairs, plan_b), spec)
    # oracle: zero the CPS outside the band, full-band plan
    plan_f = srp.make_plan(g, 512, 72)
    from mcax.kernels import cps as kcps
    from mcax.kernels import steer as ksteer
    want = helpers.run_planes(
        lambda sp: ksteer.srp_power(
            kcps.cps_phat(sp, g.pairs)
            * srp.band_bins(512, 16000.0, band),
            plan_f.e_re, plan_f.e_im), spec)
    np.testing.assert_allclose(power_b, want, rtol=1e-4, atol=1e-3)
    # band-limited SRP still localises
    az, _ = srp.argmax_doa(np.asarray(power_b), plan_b)
    assert abs(np.rad2deg(np.median(np.asarray(az))) - 55.0) <= 5.0


def test_banded_gcc_still_recovers_tdoa():
    g = geo.ArrayGeometry(positions=geo.linear_positions(2, 0.1),
                          sample_rate=16000)
    az = np.deg2rad(40.0)
    x = helpers.array_signals(g, az, 8192, seed=1)
    plan = gcc.make_plan(g, 512, band_hz=(200.0, 6000.0))
    res = helpers.run_planes(
        lambda xx: gcc.gcc_phat_block(
            stft_mod.stft(xx, win_mod.hann(512), 256), g.pairs, plan), x)
    expected = g.pair_tdoas(np.asarray([az]))[0, 0]
    assert abs(np.median(np.asarray(res["tdoa"])[0]) - expected) < 0.5 / 16000


def test_banded_pipeline_runs():
    base = cfg_mod.get_config("config3")
    cfg = dataclasses.replace(base, algo=dataclasses.replace(
        base.algo, band_hz=(300.0, 5000.0)))
    g = cfg.geometry()
    x = helpers.array_signals(g, np.deg2rad(-30.0), cfg.block_len * 2, seed=2)
    pipe = Pipeline(cfg)
    st = pipe.init_state()
    for b in range(2):
        st, out = pipe.process_block(st, x[:, b * cfg.block_len:(b + 1) * cfg.block_len])
    est = np.rad2deg(np.median(np.asarray(out["doa"])))
    assert abs(est + 30.0) < 2.0
