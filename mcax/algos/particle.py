"""Particle filter for DOA smoothing (dspone ``ParticleFilter`` analogue,
SURVEY.md §2b: a templated predict/update/resample filter used to smooth
localisation).

TPU-native formulation: a fixed population of N circular-angle particles as
one [N] tensor; predict = random-walk diffusion, update = weights from the
SRP-PHAT surface evaluated at each particle's nearest grid bin (a gather),
resample = systematic resampling via cumsum + searchsorted — all static
shapes, fully jit/vmap-friendly, explicit PRNG key threaded in the state.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class ParticleState(NamedTuple):
    angles: jnp.ndarray     # [S, N] float32 particle azimuths (rad)
    weights: jnp.ndarray    # [S, N] float32, normalised per source
    key: jnp.ndarray        # PRNG key


def init(num_sources: int, num_particles: int, seed: int = 0) -> ParticleState:
    key = jax.random.PRNGKey(seed)
    key, sub = jax.random.split(key)
    angles = jax.random.uniform(sub, (num_sources, num_particles),
                                minval=-jnp.pi, maxval=jnp.pi)
    w = jnp.full((num_sources, num_particles), 1.0 / num_particles)
    return ParticleState(angles=angles, weights=w, key=key)


def _wrap(a):
    return jnp.mod(a + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def predict(state: ParticleState, step_std_rad: float) -> ParticleState:
    """Random-walk diffusion of every particle."""
    key, sub = jax.random.split(state.key)
    noise = step_std_rad * jax.random.normal(sub, state.angles.shape)
    return ParticleState(_wrap(state.angles + noise), state.weights, key)


def update(state: ParticleState, power: jnp.ndarray,
           azimuths: jnp.ndarray, temperature: float = 1.0) -> ParticleState:
    """Reweight particles by the SRP surface.

    Args:
      power: [G] steered-response surface shared by all sources, or [S, G]
        with one (e.g. rival-suppressed) surface per source.
      azimuths: [G] grid azimuths (uniform, ascending).
    """
    g = power.shape[-1]
    # nearest grid bin per particle (uniform grid → direct index math)
    a0 = azimuths[0]
    da = azimuths[1] - azimuths[0]
    idx = jnp.clip(jnp.round((_wrap(state.angles) - a0) / da).astype(jnp.int32),
                   0, g - 1)
    if power.ndim == 1:
        p = power[idx]                                      # [S, N]
        scale = jnp.std(power)
    else:
        p = jnp.take_along_axis(power, idx, axis=-1)        # [S, N]
        scale = jnp.std(power, axis=-1, keepdims=True)      # [S, 1]
    p = p - jnp.max(p, axis=-1, keepdims=True)
    like = jnp.exp(p / jnp.maximum(temperature * scale + 1e-12, 1e-12))
    w = state.weights * like
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    return ParticleState(state.angles, w, state.key)


def effective_sample_size(state: ParticleState) -> jnp.ndarray:
    """ESS per source, in [1, N]."""
    return 1.0 / jnp.sum(state.weights ** 2, axis=-1)


def resample(state: ParticleState) -> ParticleState:
    """Systematic resampling (static-shape: always resamples; callers gate
    on ESS with jnp.where if desired)."""
    s, n = state.angles.shape
    key, sub = jax.random.split(state.key)
    u0 = jax.random.uniform(sub, (s, 1)) / n
    positions = u0 + jnp.arange(n) / n                      # [S, N]
    cum = jnp.cumsum(state.weights, axis=-1)
    idx = jax.vmap(jnp.searchsorted)(cum, positions)
    idx = jnp.clip(idx, 0, n - 1)
    angles = jnp.take_along_axis(state.angles, idx, axis=-1)
    w = jnp.full_like(state.weights, 1.0 / n)
    return ParticleState(angles, w, key)


def estimate(state: ParticleState) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted circular mean + resultant length (confidence) per source."""
    c = jnp.sum(state.weights * jnp.cos(state.angles), axis=-1)
    s = jnp.sum(state.weights * jnp.sin(state.angles), axis=-1)
    return jnp.arctan2(s, c), jnp.sqrt(c * c + s * s)


def step(state: ParticleState, power: jnp.ndarray, azimuths: jnp.ndarray,
         step_std_rad: float = 0.05,
         resample_threshold: float = 0.5) -> Tuple[ParticleState, jnp.ndarray,
                                                   jnp.ndarray]:
    """One predict→update→(conditional) resample cycle for all sources.

    Returns (new_state, doa_rad [S], confidence [S]).
    """
    st = predict(state, step_std_rad)
    st = update(st, power, azimuths)
    n = st.angles.shape[-1]
    ess = effective_sample_size(st) / n                     # [S]
    rs = resample(st)
    need = (ess < resample_threshold)[:, None]
    st = ParticleState(jnp.where(need, rs.angles, st.angles),
                       jnp.where(need, rs.weights, st.weights),
                       rs.key)
    doa, conf = estimate(st)
    return st, doa, conf
