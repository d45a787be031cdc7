"""Peak extraction + track association (component C11)."""

import jax
import numpy as np
import jax.numpy as jnp

from mcax import geometry as geo
from mcax.algos import particle
from mcax.algos import tracking


def _surface(g, peaks):
    p = np.zeros(g, np.float32)
    for idx, val in peaks:
        p[idx] = val
        p[(idx + 1) % g] = val * 0.6
        p[(idx - 1) % g] = val * 0.6
    return p


def test_extract_peaks_with_suppression():
    p = _surface(360, [(100, 10.0), (250, 8.0), (103, 9.5)])
    idx, val = tracking.extract_peaks(jnp.asarray(p), 2, suppress_bins=20)
    got = sorted(np.asarray(idx).tolist())
    assert got == [100, 250]          # 103 suppressed as a neighbor of 100


def test_extract_peaks_circular_wrap():
    p = _surface(360, [(359, 5.0), (2, 4.9), (180, 3.0)])
    idx, _ = tracking.extract_peaks(jnp.asarray(p), 2, suppress_bins=10)
    got = set(np.asarray(idx).tolist())
    assert 359 in got and 180 in got and 2 not in got


def test_tracks_seed_then_smooth():
    az = np.deg2rad(np.arange(-180.0, 180.0))
    st = tracking.init_tracks(2)
    p1 = _surface(360, [(60, 10.0), (300, 9.0)])
    st, gidx = tracking.track_block(st, jnp.asarray(p1), jnp.asarray(az, jnp.float32),
                                    suppress_bins=20, smooth=0.7)
    a0 = np.sort(np.rad2deg(np.asarray(st.angles_rad)))
    np.testing.assert_allclose(a0, [-120.0, 120.0], atol=1.0)  # grid idx 60, 300
    # second block: peaks moved 5 bins; tracks move ~30% of the error (1-smooth)
    p2 = _surface(360, [(65, 10.0), (305, 9.0)])
    st2, _ = tracking.track_block(st, jnp.asarray(p2), jnp.asarray(az, jnp.float32),
                                  suppress_bins=20, smooth=0.7)
    moved = np.rad2deg(np.asarray(st2.angles_rad) - np.asarray(st.angles_rad))
    np.testing.assert_allclose(np.abs(moved), 1.5, atol=0.2)   # 5 deg * 0.3
    assert np.all(np.asarray(st2.initialized))


def test_association_is_stable_under_permutation():
    """Peaks arriving strongest-first must map to the nearest track, not the
    first track."""
    az = np.deg2rad(np.arange(-180.0, 180.0))
    st = tracking.init_tracks(2)
    p1 = _surface(360, [(60, 10.0), (300, 9.0)])
    st, _ = tracking.track_block(st, jnp.asarray(p1), jnp.asarray(az, jnp.float32), 20, 0.7)
    # swap peak strengths: strongest now near track 1
    p2 = _surface(360, [(300, 10.0), (60, 9.0)])
    st2, _ = tracking.track_block(st, jnp.asarray(p2), jnp.asarray(az, jnp.float32), 20, 0.7)
    d = np.rad2deg(np.abs(np.asarray(st2.angles_rad) - np.asarray(st.angles_rad)))
    assert np.all(d < 2.0)            # both tracks stayed put


def test_particle_smoother_beats_ema_on_moving_sources():
    """The particle smoother (dspone ParticleFilter analogue) tracks two
    moving sources on noisy SRP surfaces with lower error than the EMA
    tracker — the in-loop smoothing win that motivates C11's smoother."""
    g = 360
    az_np = geo.azimuth_grid(g)
    az = jnp.asarray(az_np, jnp.float32)
    rng = np.random.default_rng(7)

    def surface(angles_deg, width=12.0, powers=(10.0, 8.0), noise=1.0):
        azd = np.rad2deg(az_np)
        s = np.zeros(g)
        for a, p in zip(angles_deg, powers):
            d = np.abs((azd - a + 180.0) % 360.0 - 180.0)
            s += p * np.exp(-0.5 * (d / width) ** 2)
        return (s + noise * rng.standard_normal(g)).astype(np.float32)

    def circ_err(est_deg, true_deg):
        e, t = np.asarray(est_deg), np.asarray(true_deg)
        d1 = np.abs((e - t + 180) % 360 - 180).mean()
        d2 = np.abs((e - t[::-1] + 180) % 360 - 180).mean()
        return min(d1, d2)

    pstep = jax.jit(lambda ps, s: tracking.particle_track_block(
        ps, s, az, 20, 0.05, 0.5))
    estep = jax.jit(lambda tr, s: tracking.track_block(tr, s, az, 20, 0.7))
    ps = particle.init(2, 256, seed=0)
    tr = tracking.init_tracks(2)
    errs_p, errs_e = [], []
    for b in range(60):
        truth = [-60.0 + 1.5 * b, 120.0 - 1.0 * b]
        surf = jnp.asarray(surface(truth))
        ps, doa_p, _conf, _gi = pstep(ps, surf)
        tr, _ = estep(tr, surf)
        if b >= 10:                                    # skip seeding burn-in
            errs_p.append(circ_err(np.rad2deg(np.asarray(doa_p)), truth))
            errs_e.append(circ_err(np.rad2deg(np.asarray(tr.angles_rad)),
                                   truth))
    med_p, med_e = np.median(errs_p), np.median(errs_e)
    assert med_p < 4.0, med_p                          # absolute quality
    assert med_p < med_e, (med_p, med_e)               # beats the EMA lag


def test_particle_track_block_separates_two_sources():
    """Rival-suppressed per-cloud surfaces keep the two clouds on their own
    sources (no collapse onto the louder peak)."""
    g = 360
    az = jnp.asarray(geo.azimuth_grid(g), jnp.float32)
    azd = np.rad2deg(geo.azimuth_grid(g))
    s = np.zeros(g)
    for a, p in [(40.0, 10.0), (-100.0, 6.0)]:         # one much louder
        d = np.abs((azd - a + 180.0) % 360.0 - 180.0)
        s += p * np.exp(-0.5 * (d / 10.0) ** 2)
    surf = jnp.asarray(s.astype(np.float32))
    ps = particle.init(2, 256, seed=3)
    for _ in range(25):
        ps, doa, conf, gidx = tracking.particle_track_block(
            ps, surf, az, 20, 0.05, 0.5)
    got = np.sort(np.rad2deg(np.asarray(doa)))
    np.testing.assert_allclose(got, [-100.0, 40.0], atol=4.0)


def test_wrap_angle():
    a = np.asarray([0.0, np.pi, -np.pi, 3 * np.pi, -2.5 * np.pi])
    got = np.asarray(tracking.wrap_angle(jnp.asarray(a)))
    assert np.all(got > -np.pi - 1e-6) and np.all(got <= np.pi + 1e-6)
    np.testing.assert_allclose(np.cos(got), np.cos(a), atol=1e-6)
