"""Covariance recursion + MVDR solve vs float64 oracle; property tests
(distortionless constraint, diagonal loading) per SURVEY.md §4.2."""

import numpy as np
import pytest

from mcax import geometry as geo
from mcax.algos import covariance as cov_mod
from mcax.algos import delaysum
from mcax.algos import mvdr
from mcax.frames import stft as stft_mod
from mcax.frames import window as win_mod
from tests import helpers
from tests.oracle import oracle_np


def _geom(c=8, fs=16000):
    return geo.ArrayGeometry(positions=geo.circular_positions(c, 0.05),
                             sample_rate=fs)


def _spectra(g, az_deg=30.0, n=4096, seed=21):
    x = helpers.array_signals(g, np.deg2rad(az_deg), n, seed=seed,
                              noise_db=-20.0)
    return helpers.run_planes(
        lambda xx: stft_mod.stft(xx, win_mod.hann(512), 256), x)


def test_block_covariance_matches_per_frame_recursion():
    g = _geom()
    spec = _spectra(g)
    r0 = np.zeros((257, 8, 8), np.complex64)
    got = helpers.run_planes(lambda r, sp: cov_mod.update(r, sp, 0.95),
                             r0, spec)
    want = oracle_np.covariance_update(r0, spec, 0.95)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_covariance_is_hermitian_psd():
    g = _geom()
    spec = _spectra(g)
    r = helpers.run_planes(
        lambda sp: cov_mod.update(cov_mod.init(257, 8), sp, 0.9), spec)
    np.testing.assert_allclose(r, np.conj(np.swapaxes(r, -1, -2)), rtol=1e-5,
                               atol=1e-5)
    ev = np.linalg.eigvalsh(r)
    assert ev.min() > -1e-6


def test_hermitian_solve_matches_numpy():
    rng = np.random.default_rng(3)
    c, f = 8, 33
    a = (rng.standard_normal((f, c, c)) + 1j * rng.standard_normal((f, c, c)))
    r = (a @ np.conj(np.swapaxes(a, -1, -2)) / c +
         0.1 * np.eye(c)).astype(np.complex64)
    d = (rng.standard_normal((f, c)) + 1j * rng.standard_normal((f, c))
         ).astype(np.complex64)
    got = helpers.run_planes(mvdr.hermitian_solve, r, d)
    want = np.stack([np.linalg.solve(r[i].astype(np.complex128), d[i])
                     for i in range(f)])
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_mvdr_weights_match_oracle_and_distortionless():
    g = _geom()
    spec = _spectra(g)
    r = helpers.run_planes(
        lambda sp: cov_mod.update(cov_mod.init(257, 8), sp, 0.95), spec)
    steer = np.asarray(delaysum.steering_vector(g, np.deg2rad(30.0), 512))
    got = helpers.run_planes(
        lambda rr, dd: mvdr.weights(rr, dd, diag_load=1e-3), r, steer)
    want = oracle_np.mvdr_weights(r, steer, 1e-3)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)
    # distortionless: w^H d = 1 per bin (SURVEY.md §4.2.2)
    resp = np.einsum("cf,cf->f", np.conj(got), steer)
    np.testing.assert_allclose(resp, np.ones_like(resp), rtol=1e-3, atol=1e-3)


def test_mvdr_suppresses_interferer():
    """Target at 30deg passes (distortionless); interferer at -80deg is
    attenuated relative to a plain delay-sum beam."""
    g = _geom()
    n = 16384
    target = helpers.array_signals(g, np.deg2rad(30.0), n, seed=1,
                                   noise_db=-60.0)
    interf = helpers.array_signals(g, np.deg2rad(-80.0), n, seed=2,
                                   noise_db=-60.0)
    w = win_mod.hann(512)
    spec_int = helpers.run_planes(lambda xx: stft_mod.stft(xx, w, 256),
                                  interf)
    # noise covariance from the interference-only segment (classic MVDR setup)
    steer = np.asarray(delaysum.steering_vector(g, np.deg2rad(30.0), 512))

    def chain(sp, st):
        r = cov_mod.update(cov_mod.init(257, 8), sp, 0.9)
        wts = mvdr.weights(r, st, 1e-3)
        return mvdr.beamform(sp, wts), delaysum.beamform(sp, st)

    y_mvdr, y_ds = helpers.run_planes(chain, spec_int, steer)
    resid_mvdr = np.abs(y_mvdr) ** 2
    resid_ds = np.abs(y_ds) ** 2
    # MVDR nulls the interferer far deeper than delay-sum
    assert resid_mvdr.sum() < 0.05 * resid_ds.sum()


def test_diagonal_loading_regularises():
    c = 4
    r = np.zeros((1, c, c), np.complex64)          # singular
    loaded = helpers.run_planes(
        lambda rr: cov_mod.loaded(rr, 1e-2),
        (r + np.eye(c) * 1e-9).astype(np.complex64))
    assert np.linalg.cond(loaded[0]).real < 1e8
