"""Fractional-delay delay-sum beamformer (component C7).

Reference analogue: mcarray's delay-sum beamformer steered toward a fixed or
localised DOA.  Fractional steering delays are exact per-bin phase ramps in
the STFT domain (e^{+j omega t_c}), so "fractional delay" costs one complex
multiply per bin — no time-domain interpolation filters (SURVEY.md §2a C7).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mcax import geometry as geo


def steering_vector(geom: geo.ArrayGeometry, azimuth_rad: float,
                    n_fft: int) -> np.ndarray:
    """Host-side complex steering vector v_c(f) = e^{-j omega t_c(theta)}.

    [C, F] complex64; the observed spectrum of a source at theta is
    X_c = v_c * S, so alignment multiplies by conj(v).
    """
    f = n_fft // 2 + 1
    omega = 2.0 * np.pi * geom.sample_rate * np.arange(f) / n_fft
    t = geom.mic_delays(np.asarray([azimuth_rad]))[0]      # [C]
    phase = -omega[None, :] * t[:, None]                   # [C, F]
    return np.exp(1j * phase).astype(np.complex64)


def beamform(spectra: jnp.ndarray, steer: jnp.ndarray) -> jnp.ndarray:
    """Delay-sum in the STFT domain.

    Args:
      spectra: complex64 [..., C, T, F].
      steer: complex64 steering vector [C, F] (or broadcastable [..., C, F],
        e.g. per-source [S, C, F] against spectra [C, T, F] after expanding).
    Returns:
      complex64 beamformed spectra [..., T, F] = (1/C) sum_c conj(v_c) X_c.
    """
    c = spectra.shape[-3]
    aligned = spectra * jnp.conj(steer)[..., :, None, :]
    return jnp.sum(aligned, axis=-3) / c
