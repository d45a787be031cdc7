"""Peak extraction + track association (component C11)."""

import numpy as np
import jax.numpy as jnp

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


def test_wrap_angle():
    a = np.asarray([0.0, np.pi, -np.pi, 3 * np.pi, -2.5 * np.pi])
    got = np.asarray(tracking.wrap_angle(jnp.asarray(a)))
    assert np.all(got > -np.pi - 1e-6) and np.all(got <= np.pi + 1e-6)
    np.testing.assert_allclose(np.cos(got), np.cos(a), atol=1e-6)
