"""GCC weighting family (phat/scot/roth/cc) + SRP sub-grid interpolation."""

import numpy as np
import pytest

from mcax import geometry as geo
from mcax.algos import gcc, srp
from mcax.frames import stft as stft_mod
from mcax.frames import window as win_mod
from mcax.kernels import cps as kcps
from tests import helpers


def _geom2():
    return geo.ArrayGeometry(positions=geo.linear_positions(2, 0.1),
                             sample_rate=16000)


def _spec(g, az_deg=30.0, seed=0):
    x = helpers.array_signals(g, np.deg2rad(az_deg), 8192, seed=seed)
    return helpers.run_planes(
        lambda xx: stft_mod.stft(xx, win_mod.hann(512), 256), x)


@pytest.mark.parametrize("weighting", ["phat", "scot", "roth", "cc"])
def test_all_weightings_recover_tdoa(weighting):
    g = _geom2()
    az = np.deg2rad(30.0)
    spec = _spec(g, 30.0)
    plan = gcc.make_plan(g, 512)
    res = helpers.run_planes(
        lambda sp: gcc.gcc_phat_block(sp, g.pairs, plan,
                                      weighting=weighting), spec)
    expected = g.pair_tdoas(np.asarray([az]))[0, 0]
    tol = (0.3 if weighting in ("phat", "scot") else 1.0) / g.sample_rate
    assert abs(np.median(np.asarray(res["tdoa"])[0]) - expected) < tol


def test_weighting_formulas():
    g = _geom2()
    spec = _spec(g, 10.0)
    pairs = g.pairs
    raw = helpers.run_planes(
        lambda sp: kcps.cps_weighted(sp, pairs, "cc"), spec)
    want_raw = spec[0] * np.conj(spec[1])
    np.testing.assert_allclose(raw[0], want_raw, rtol=1e-4, atol=1e-4)
    scot = helpers.run_planes(
        lambda sp: kcps.cps_weighted(sp, pairs, "scot"), spec)
    want = want_raw / (np.sqrt(np.abs(spec[0]) ** 2 * np.abs(spec[1]) ** 2)
                       + 1e-12)
    np.testing.assert_allclose(scot[0], want, rtol=1e-3, atol=1e-4)
    roth = helpers.run_planes(
        lambda sp: kcps.cps_weighted(sp, pairs, "roth"), spec)
    want = want_raw / (np.abs(spec[0]) ** 2 + 1e-12)
    np.testing.assert_allclose(roth[0], want, rtol=1e-3, atol=1e-4)
    with pytest.raises(ValueError, match="unknown GCC weighting"):
        helpers.run_planes(
            lambda sp: kcps.cps_weighted(sp, pairs, "ml"), spec)


def test_srp_interpolation_improves_offgrid_doa():
    g = geo.ArrayGeometry(positions=geo.circular_positions(8, 0.05),
                          sample_rate=16000)
    true_deg = 40.6                              # between 1-deg grid points
    x = helpers.array_signals(g, np.deg2rad(true_deg), 16384, seed=3)
    plan = srp.make_plan(g, 512, 360)
    power = helpers.run_planes(
        lambda xx: srp.srp_surface(
            stft_mod.stft(xx, win_mod.hann(512), 256), g.pairs, plan), x)
    pmean = power.mean(axis=0)[None]
    az_g, _ = helpers.run_planes(
        lambda pm: srp.argmax_doa(pm, plan, interpolate=False), pmean)
    az_i, _ = helpers.run_planes(
        lambda pm: srp.argmax_doa(pm, plan, interpolate=True), pmean)
    err_g = abs(np.rad2deg(float(az_g[0])) - true_deg)
    err_i = abs(np.rad2deg(float(az_i[0])) - true_deg)
    assert err_i <= err_g + 1e-6
    assert err_i < 0.4, (err_i, err_g)
