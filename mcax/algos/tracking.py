"""Multi-source peak extraction + tracking (component C11, SURVEY.md §2a).

Config 5: per block, the mean SRP-PHAT surface is reduced to K peaks by
iterative argmax with circular neighborhood suppression (static K-step loop —
jit-friendly), peaks are greedily associated to existing tracks by circular
angular distance, and tracks are exponentially smoothed.  A particle-filter
smoother (the reference's dspone ParticleFilter analogue) is provided in
mcax.algos.particle and can replace the EMA update.

All state is an explicit pytree (track angles/confidences), threaded through
process_block like every other streaming state.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class TrackState(NamedTuple):
    angles_rad: jnp.ndarray     # [S] float32, current track azimuths
    confidence: jnp.ndarray     # [S] float32, EMA of associated peak power
    initialized: jnp.ndarray    # [S] bool


def init_tracks(num_sources: int) -> TrackState:
    s = num_sources
    return TrackState(
        angles_rad=jnp.zeros((s,), jnp.float32),
        confidence=jnp.zeros((s,), jnp.float32),
        initialized=jnp.zeros((s,), bool),
    )


def wrap_angle(a: jnp.ndarray) -> jnp.ndarray:
    """Wrap to (-pi, pi]."""
    return jnp.mod(a + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def circular_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(wrap_angle(a - b))


def extract_peaks(power: jnp.ndarray, num_peaks: int,
                  suppress_bins: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """K peaks from a circular power surface [G] with neighborhood suppression.

    Returns (grid_idx [K] int32, values [K] float32), strongest first.
    """
    g = power.shape[-1]
    offs = jnp.arange(g)

    def one(carry, _):
        p = carry
        k = jnp.argmax(p, axis=-1)
        v = p[k]
        dist = jnp.abs((offs - k + g // 2) % g - g // 2)   # circular bins
        p = jnp.where(dist <= suppress_bins, jnp.finfo(p.dtype).min, p)
        return p, (k.astype(jnp.int32), v)

    _, (idx, val) = jax.lax.scan(one, power, None, length=num_peaks)
    return idx, val


def associate_and_update(state: TrackState, peak_angles: jnp.ndarray,
                         peak_values: jnp.ndarray, smooth: float,
                         conf_smooth: float = 0.8) -> TrackState:
    """Greedy peak→track association + EMA update.

    Peaks arrive strongest-first ([K] with K == S).  Each peak claims its
    nearest unclaimed track; uninitialized tracks snap to their first peak.
    Static loops only (S is tiny), so this stays inside jit.
    """
    s = state.angles_rad.shape[0]
    angles = state.angles_rad
    conf = state.confidence
    inited = state.initialized
    claimed = jnp.zeros((s,), bool)

    for k in range(s):
        pa, pv = peak_angles[k], peak_values[k]
        d = circular_distance(angles, pa)
        # uninitialized tracks look infinitely far but are preferred last via
        # a large-but-finite distance, so first peaks seed them.
        d = jnp.where(inited, d, jnp.pi * 2.0)
        d = jnp.where(claimed, jnp.inf, d)
        j = jnp.argmin(d)
        onehot = jax.nn.one_hot(j, s, dtype=bool)
        err = wrap_angle(pa - angles)
        new_angle = jnp.where(inited, wrap_angle(angles + (1.0 - smooth) * err), pa)
        angles = jnp.where(onehot, new_angle, angles)
        conf = jnp.where(onehot, conf_smooth * conf + (1 - conf_smooth) * pv, conf)
        inited = inited | onehot
        claimed = claimed | onehot

    return TrackState(angles_rad=angles, confidence=conf, initialized=inited)


def particle_track_block(pstate, power_mean: jnp.ndarray,
                         azimuths_rad: jnp.ndarray, suppress_bins: int,
                         step_std_rad: float, resample_threshold: float):
    """One block of particle-filter tracking (C11 particle smoother).

    The dspone-ParticleFilter-analogue replacement for the EMA tracker:
    the block's K strongest SRP peaks are greedily associated to the S
    particle clouds (nearest cloud estimate claims the strongest peak
    first), then each cloud runs one predict→reweight→resample cycle on
    the surface with its RIVALS' peak neighborhoods suppressed — so two
    clouds cannot collapse onto one loud source.

    Returns (new_pstate, doa_rad [S], confidence [S], grid_idx [S]).
    """
    from mcax.algos import particle

    s = pstate.angles.shape[0]
    g = power_mean.shape[-1]
    idx, _val = extract_peaks(power_mean, s, suppress_bins)  # [S] strongest 1st
    peak_angles = azimuths_rad[idx]
    est, _ = particle.estimate(pstate)                       # [S] cloud means

    # greedy peak→cloud association (strongest peak claims nearest cloud)
    claimed = jnp.zeros((s,), bool)
    cloud_peak = jnp.zeros((s,), jnp.int32)
    for k in range(s):
        d = circular_distance(est, peak_angles[k])
        d = jnp.where(claimed, jnp.inf, d)
        j = jnp.argmin(d)
        onehot = jax.nn.one_hot(j, s, dtype=bool)
        cloud_peak = jnp.where(onehot, idx[k], cloud_peak)
        claimed = claimed | onehot

    # per-cloud surface: suppress every OTHER cloud's peak neighborhood
    offs = jnp.arange(g)
    dist = jnp.abs((offs[None, :] - cloud_peak[:, None] + g // 2) % g
                   - g // 2)                                  # [S, G] bins
    near = dist <= suppress_bins                              # own neighborhood
    rival_near = jnp.any(near, axis=0)[None, :] & ~near       # [S, G]
    floor = jnp.min(power_mean)
    masked = jnp.where(rival_near, floor, power_mean[None, :])  # [S, G]

    new_ps, doa, conf = particle.step(pstate, masked, azimuths_rad,
                                      step_std_rad, resample_threshold)
    d = circular_distance(doa[:, None], azimuths_rad[None, :])
    grid_idx = jnp.argmin(d, axis=-1).astype(jnp.int32)
    return new_ps, doa, conf, grid_idx


def track_block(state: TrackState, power_mean: jnp.ndarray,
                azimuths_rad: jnp.ndarray, suppress_bins: int,
                smooth: float) -> Tuple[TrackState, jnp.ndarray]:
    """One block of tracking: SRP surface [G] → updated tracks.

    Returns (new_state, grid_idx [S]) where grid_idx are the grid points
    nearest the smoothed track angles (for steering-vector gathers).
    """
    s = state.angles_rad.shape[0]
    idx, val = extract_peaks(power_mean, s, suppress_bins)
    peak_angles = azimuths_rad[idx]
    new_state = associate_and_update(state, peak_angles, val, smooth)
    # nearest grid point per smoothed track angle
    d = circular_distance(new_state.angles_rad[:, None], azimuths_rad[None, :])
    grid_idx = jnp.argmin(d, axis=-1).astype(jnp.int32)
    return new_state, grid_idx
