"""Recursive spatial covariance estimation (component C8).

R[f] <- lambda R[f] + (1 - lambda) x[f] x[f]^H  per frame, with diagonal
loading R + delta*tr(R)/C*I applied at solve time (mvdr.py).

The per-frame recursion over a block has the closed form

    R_T = lambda^T R_0 + (1-lambda) sum_k lambda^{T-1-k} x_k x_k^H

so a whole block updates with ONE weighted einsum on the MXU instead of a
T-step scan — the TPU-native replacement for the reference-style per-frame
update loop.  The same (decay, partial-sum) pair is the monoid used by the
distributed time-shard combine (mcax.dist.scan), which keeps the sharded
recursion bit-exact (SURVEY.md §5 "long-context").
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def block_stats(spectra: jnp.ndarray, forget: float):
    """Per-block covariance update statistics.

    Args:
      spectra: complex64 [C, T, F] (a block of frames).
      forget: lambda in (0, 1].
    Returns:
      (decay, partial): decay = lambda^T (scalar float32), partial [F, C, C]
      complex64 with  R_new = decay * R_old + partial.
    """
    c, t, f = spectra.shape
    lam = jnp.float32(forget)
    # weights w_k = (1-lambda) * lambda^{T-1-k}
    k = jnp.arange(t, dtype=jnp.float32)
    w = (1.0 - lam) * lam ** (jnp.float32(t - 1) - k)      # [T]
    x = jnp.moveaxis(spectra, 0, -1)                       # [T, F, C]
    xw = x * w[:, None, None].astype(spectra.dtype)
    partial = jnp.einsum("tfc,tfd->fcd", xw, jnp.conj(x))
    return lam ** t, partial


def update(cov: jnp.ndarray, spectra: jnp.ndarray, forget: float) -> jnp.ndarray:
    """One block's recursive covariance update: [F, C, C] -> [F, C, C]."""
    decay, partial = block_stats(spectra, forget)
    return cov * decay.astype(cov.dtype) + partial


def init(num_bins: int, num_mics: int, scale: float = 1e-6) -> jnp.ndarray:
    """Initial covariance: small identity so the first solves are sane."""
    eye = np.eye(num_mics, dtype=np.complex64) * scale
    return jnp.broadcast_to(jnp.asarray(eye), (num_bins, num_mics, num_mics))


def loaded(cov: jnp.ndarray, delta: float) -> jnp.ndarray:
    """Diagonal loading: R + delta * tr(R)/C * I (SURVEY.md §3.4)."""
    c = cov.shape[-1]
    tr = jnp.trace(cov, axis1=-2, axis2=-1).real / c       # [F]
    eye = jnp.eye(c, dtype=cov.dtype)
    return cov + (delta * tr)[..., None, None].astype(cov.dtype) * eye
