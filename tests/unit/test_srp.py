"""SRP-PHAT vs the brute-force triple-loop oracle + DOA recovery sweep.

Computation runs through helpers.run_planes (one jit, float-plane
boundaries) so the suite is part of the on-chip lane (tools/tpu_suite.py)
as well as CPU CI.
"""

import numpy as np
import pytest

from mcax import geometry as geo
from mcax.algos import srp
from mcax.frames import stft as stft_mod
from mcax.frames import window as win_mod
from tests import helpers
from tests.oracle import oracle_np


def _geom(c=8, r=0.05, fs=16000):
    return geo.ArrayGeometry(positions=geo.circular_positions(c, r),
                             sample_rate=fs)


def test_srp_surface_matches_oracle():
    g = _geom()
    x = helpers.array_signals(g, np.deg2rad(70.0), 2048, seed=11)
    w = win_mod.hann(512)
    plan = srp.make_plan(g, 512, grid_points=72)
    spec = helpers.run_planes(lambda xx: stft_mod.stft(xx, w, 256), x)
    got = helpers.run_planes(
        lambda sp: srp.srp_surface(sp, g.pairs, plan), spec)
    want = oracle_np.srp_surface(spec, g, plan.azimuths_rad, 512)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


@pytest.mark.parametrize("az_deg", [-150.0, -90.0, -10.0, 0.0, 45.0, 130.0])
def test_srp_recovers_injected_doa(az_deg):
    g = _geom()
    x = helpers.array_signals(g, np.deg2rad(az_deg), 8192, seed=12)
    w = win_mod.hann(512)
    plan = srp.make_plan(g, 512, grid_points=360)

    def chain(xx):
        spec = stft_mod.stft(xx, w, 256)
        power = srp.srp_surface(spec, g.pairs, plan)
        az, _ = srp.argmax_doa(power, plan)
        return az

    az = helpers.run_planes(chain, x)
    est = np.rad2deg(np.median(az))
    err = abs((est - az_deg + 180.0) % 360.0 - 180.0)
    assert err <= 1.5, (est, az_deg)


def test_steering_vector_gather_matches_plan():
    g = _geom()
    plan = srp.make_plan(g, 512, grid_points=36)
    v = helpers.run_planes(
        lambda: srp.steering_vector(plan, np.asarray([3, 17])))
    assert v.shape == (2, 8, 257)
    want = plan.steer_re[3] + 1j * plan.steer_im[3]
    np.testing.assert_allclose(v[0], want, atol=1e-6)
    # steering vectors are unit-modulus phase ramps
    np.testing.assert_allclose(np.abs(v), 1.0, atol=1e-5)
