"""Binaural phase-difference masking (reference-parity component).

Reference analogue: mcarray's "fast binaural masking" style 2-mic spatial
filter (SURVEY.md §2b): STFT bins whose inter-channel phase difference is
inconsistent with the target DOA are attenuated, then channel 1 is
resynthesised.  The mask is a smooth sigmoid in wrapped phase error (a soft
version of the reference's threshold mask — the hard threshold is the
sharpness → inf limit; both are parity knobs in AlgoConfig).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mcax import geometry as geo


def expected_phase(geom: geo.ArrayGeometry, azimuth_rad: float,
                   n_fft: int) -> np.ndarray:
    """Target inter-channel phase Δφ(f) = ω τ_01(θ) for mic pair (0, 1). [F]."""
    f = n_fft // 2 + 1
    omega = 2.0 * np.pi * geom.sample_rate * np.arange(f) / n_fft
    tau = geom.pair_tdoas(np.asarray([azimuth_rad]))[0, 0]
    return (omega * tau).astype(np.float32)


def mask_block(spectra: jnp.ndarray, target_phase: jnp.ndarray,
               threshold_rad: float, sharpness: float) -> jnp.ndarray:
    """Apply the binaural mask to channel 0.

    Args:
      spectra: complex64 [2, T, F] (stereo block spectra).
      target_phase: [F] expected phase difference for the target DOA.
    Returns:
      complex64 masked spectra [T, F] (channel 0 weighted by the mask).
    """
    x0, x1 = spectra[0], spectra[1]
    dphi = jnp.angle(x0 * jnp.conj(x1))                    # observed Δφ [T, F]
    err = dphi - target_phase
    err = jnp.mod(err + jnp.pi, 2 * jnp.pi) - jnp.pi       # wrap to (-pi, pi]
    mask = jax.nn.sigmoid(sharpness * (threshold_rad - jnp.abs(err)))
    return x0 * mask.astype(x0.dtype)
