"""SRP-PHAT steering-power matmul (component C6 inner loop — native tier).

The reference evaluates steered response power with a triple loop over
(grid point, pair, bin) per frame (SURVEY.md §3.3).  On TPU this collapses to
two real matmuls on the MXU:

    power[T, G] = G_re[T, P*F] @ E_re[P*F, G] - G_im[T, P*F] @ E_im[P*F, G]

where E = e^{j omega_f tau_p(theta_g)} is the precomputed steering-phase
matrix (host constant from the array geometry) and G is the PHAT-weighted
cross-power spectrum.  At config 3's sizes ([T,7196]@[7196,360]) this is an
ideal MXU shape; the Pallas kernel (M5) fuses the two matmuls and the
subtraction with K-dimension accumulation so E streams through VMEM once.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mcax import geometry as geo


def steering_matrices(geom: geo.ArrayGeometry, azimuths_rad: np.ndarray,
                      n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Host-precomputed steering phases for an SRP grid.

    Returns (E_re, E_im), each float32 [P*F, G], with
    E[pf, g] = e^{+j omega_f tau_p(theta_g)} flattened over (pair, bin).
    The +j sign matches cps.cross_power's ``X_i conj(X_j)`` phase convention
    (see mcax.geometry module docstring).
    """
    f = n_fft // 2 + 1
    tau = geom.pair_tdoas(azimuths_rad)                    # [G, P] seconds
    omega = 2.0 * np.pi * geom.sample_rate * np.arange(f) / n_fft   # [F]
    phase = omega[None, None, :] * tau.T[:, :, None]       # [P, G, F]
    phase = np.transpose(phase, (0, 2, 1)).reshape(-1, len(azimuths_rad))
    return (np.cos(phase).astype(np.float32),
            np.sin(phase).astype(np.float32))


def srp_power(g_phat: jnp.ndarray, e_re: jnp.ndarray,
              e_im: jnp.ndarray) -> jnp.ndarray:
    """Steered response power.

    Args:
      g_phat: complex64 [..., P, T, F] PHAT-weighted cross-power spectra.
      e_re, e_im: [P*F, G] steering matrices from steering_matrices().
    Returns:
      float32 power [..., T, G].
    """
    *lead, p, t, f = g_phat.shape
    gr = jnp.real(g_phat)
    gi = jnp.imag(g_phat)
    # [..., P, T, F] -> [..., T, P*F]
    gr = jnp.moveaxis(gr, -2, -3).reshape(*lead, t, p * f)
    gi = jnp.moveaxis(gi, -2, -3).reshape(*lead, t, p * f)
    er = jnp.asarray(e_re)
    ei = jnp.asarray(e_im)
    return gr @ er - gi @ ei
