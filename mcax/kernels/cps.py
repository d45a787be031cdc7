"""Cross-power spectrum + PHAT weighting (component C4 — native tier).

In the reference this is the inner loop of the GCC/SRP localisation modules:
per mic pair, per bin, ``X_i * conj(X_j)`` followed by PHAT normalisation
``CPS / (|CPS| + eps)`` (wipp element-wise mult/conj kernels, SURVEY.md §3.2).

TPU-natively the whole block is one fused VPU pass over ``[P, T, F]``: the
pair gather, complex multiply, magnitude, reciprocal and scale fuse into a
single kernel (Pallas backend) or a single XLA fusion (jnp path — XLA already
fuses this chain well, which is why the Pallas win here is the *gather* fusion
rather than raw FLOPs).

PHAT epsilon is a parity knob (SURVEY.md §7.4): configurable, default 1e-12.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_PHAT_EPS = 1e-12


def cross_power(spectra: jnp.ndarray, pairs: np.ndarray) -> jnp.ndarray:
    """Per-pair cross-power spectra.

    Args:
      spectra: complex64 [..., C, T, F].
      pairs: int [P, 2] host constant (i, j) with i < j.
    Returns:
      complex64 [..., P, T, F] = X_i * conj(X_j).
    """
    i = jnp.asarray(pairs[:, 0])
    j = jnp.asarray(pairs[:, 1])
    xi = jnp.take(spectra, i, axis=-3)
    xj = jnp.take(spectra, j, axis=-3)
    return xi * jnp.conj(xj)


def phat_weight(cps: jnp.ndarray, eps: float = DEFAULT_PHAT_EPS) -> jnp.ndarray:
    """PHAT normalisation: CPS / (|CPS| + eps)."""
    mag = jnp.abs(cps)
    return cps / (mag + jnp.asarray(eps, mag.dtype))


def cps_phat(spectra: jnp.ndarray, pairs: np.ndarray,
             eps: float = DEFAULT_PHAT_EPS,
             weighted: bool = True) -> jnp.ndarray:
    """Fused pair cross-power spectrum with optional PHAT weighting.

    The single entry point used by GCC (SURVEY.md §3.2) and SRP (§3.3).
    """
    g = cross_power(spectra, pairs)
    return phat_weight(g, eps) if weighted else g


def cps_phat_planes(spec_re: jnp.ndarray, spec_im: jnp.ndarray,
                    pairs: np.ndarray, eps: float = DEFAULT_PHAT_EPS):
    """Real/imag-plane variant used inside Pallas pipelines (no complex dtype
    in Mosaic): returns (g_re, g_im) each [..., P, T, F] float32."""
    i = jnp.asarray(pairs[:, 0])
    j = jnp.asarray(pairs[:, 1])
    ar, ai = jnp.take(spec_re, i, axis=-3), jnp.take(spec_im, i, axis=-3)
    br, bi = jnp.take(spec_re, j, axis=-3), jnp.take(spec_im, j, axis=-3)
    gr = ar * br + ai * bi
    gi = ai * br - ar * bi
    mag = jnp.sqrt(gr * gr + gi * gi)
    w = 1.0 / (mag + jnp.float32(eps))
    return gr * w, gi * w
