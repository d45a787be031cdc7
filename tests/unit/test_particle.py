"""Particle-filter DOA smoother (dspone ParticleFilter analogue)."""

import numpy as np
import jax.numpy as jnp

from mcax import geometry as geo
from mcax.algos import particle


def _surface(center_deg, g=360, width=10.0, power=10.0):
    az = np.rad2deg(geo.azimuth_grid(g))
    d = np.abs((az - center_deg + 180.0) % 360.0 - 180.0)
    return (power * np.exp(-0.5 * (d / width) ** 2)).astype(np.float32)


def test_converges_to_static_peak():
    az = jnp.asarray(geo.azimuth_grid(360), jnp.float32)
    st = particle.init(1, 256, seed=0)
    surf = jnp.asarray(_surface(40.0))
    for _ in range(20):
        st, doa, conf = particle.step(st, surf, az)
    assert abs(np.rad2deg(float(doa[0])) - 40.0) < 3.0
    assert float(conf[0]) > 0.9


def test_tracks_moving_peak():
    az = jnp.asarray(geo.azimuth_grid(360), jnp.float32)
    st = particle.init(1, 512, seed=1)
    errs = []
    for k in range(40):
        target = -60.0 + 2.0 * k                  # 2 deg per step
        st, doa, _ = particle.step(st, jnp.asarray(_surface(target)), az,
                                   step_std_rad=0.08)
        if k > 10:
            errs.append(abs((np.rad2deg(float(doa[0])) - target + 180.0)
                            % 360.0 - 180.0))
    assert np.median(errs) < 5.0, np.median(errs)


def test_tracks_across_wraparound():
    az = jnp.asarray(geo.azimuth_grid(360), jnp.float32)
    st = particle.init(1, 512, seed=2)
    for k in range(40):
        target = 170.0 + 1.0 * k                  # crosses +180 -> -180
        st, doa, _ = particle.step(st, jnp.asarray(_surface(target)), az,
                                   step_std_rad=0.08)
    final = np.rad2deg(float(doa[0]))
    want = ((170.0 + 39.0 + 180.0) % 360.0) - 180.0
    assert abs((final - want + 180.0) % 360.0 - 180.0) < 5.0


def test_weights_normalised_and_ess_bounds():
    az = jnp.asarray(geo.azimuth_grid(360), jnp.float32)
    st = particle.init(2, 128, seed=3)
    st, _, _ = particle.step(st, jnp.asarray(_surface(0.0)), az)
    w = np.asarray(st.weights)
    np.testing.assert_allclose(w.sum(axis=-1), 1.0, atol=1e-5)
    ess = np.asarray(particle.effective_sample_size(st))
    assert np.all(ess >= 1.0) and np.all(ess <= 128.0)


def test_resample_preserves_strong_particles():
    st = particle.init(1, 8, seed=4)
    w = np.zeros((1, 8), np.float32)
    w[0, 3] = 1.0
    st = particle.ParticleState(st.angles, jnp.asarray(w), st.key)
    rs = particle.resample(st)
    np.testing.assert_allclose(np.asarray(rs.angles),
                               float(st.angles[0, 3]), atol=1e-6)
