"""Filters and filter banks (dspone-parity components, SURVEY.md §2b:
dspone ships FIR/IIR filters, a mel/sub-band filter bank and pre-emphasis).

TPU-native formulations:
  * FIR — one conv_general_dilated over the whole block (MXU-friendly),
    streaming via an explicit (ntaps-1)-sample carry.
  * Pre-emphasis — first-order difference, streaming via 1-sample carry.
  * IIR biquad — the 2nd-order recurrence as an ``associative_scan`` over
    2x2 state-transition matrices: O(log N) depth instead of an N-step
    scalar loop, the standard trick for linear recurrences on parallel
    hardware (replaces dspone's per-sample C++ loop).
  * Mel filter bank — a precomputed [n_mels, F] triangular weight matrix
    applied as a matmul over STFT power spectra.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# FIR
# ---------------------------------------------------------------------------

def fir_apply(x: jnp.ndarray, taps: np.ndarray,
              carry: Optional[jnp.ndarray] = None
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Causal FIR over the last axis with streaming carry.

    Args:
      x: [..., N] float32.
      taps: [K] host constant (b[0] applies to the current sample).
      carry: [..., K-1] previous block's tail (zeros to start).
    Returns:
      (y [..., N], new_carry [..., K-1]).
    """
    k = int(taps.shape[0])
    if carry is None:
        carry = jnp.zeros((*x.shape[:-1], k - 1), x.dtype)
    ext = jnp.concatenate([carry, x], axis=-1)             # [..., N + K - 1]
    w = jnp.asarray(taps[::-1].copy(), x.dtype)            # correlate = flip
    lead = ext.shape[:-1]
    flat = ext.reshape(-1, 1, ext.shape[-1])
    y = jax.lax.conv_general_dilated(
        flat, w.reshape(1, 1, k), window_strides=(1,), padding="VALID")
    y = y.reshape(*lead, -1)
    return y, ext[..., ext.shape[-1] - (k - 1):]


def preemphasis(x: jnp.ndarray, coef: float = 0.97,
                carry: Optional[jnp.ndarray] = None
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """y[n] = x[n] - coef * x[n-1], streaming across blocks. [..., N]."""
    if carry is None:
        carry = jnp.zeros((*x.shape[:-1], 1), x.dtype)
    prev = jnp.concatenate([carry, x[..., :-1]], axis=-1)
    return x - jnp.asarray(coef, x.dtype) * prev, x[..., -1:]


# ---------------------------------------------------------------------------
# IIR biquad via associative scan
# ---------------------------------------------------------------------------

def biquad_apply(x: jnp.ndarray, b: np.ndarray, a: np.ndarray,
                 carry: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Direct-form-II-transposed biquad, parallelised over the time axis.

    y[n] = b0 x[n] + s1[n-1];  s1[n] = b1 x[n] - a1 y[n] + s2[n-1];
    s2[n] = b2 x[n] - a2 y[n].  Substituting gives the linear recurrence
    s[n] = A s[n-1] + c[n] with constant A = [[-a1, 1], [-a2, 0]] and input
    c[n] = x[n]*[b1 - a1 b0, b2 - a2 b0]; solved with associative_scan over
    (A-product, affine-offset) pairs in O(log N) depth.

    Args:
      x: [..., N]; b: [3]; a: [3] with a[0] == 1.
      carry: [..., 2] filter state (s1, s2) from the previous block.
    Returns:
      (y [..., N], new_carry [..., 2]).
    """
    b = np.asarray(b, np.float64) / float(a[0])
    a = np.asarray(a, np.float64) / float(a[0])
    if carry is None:
        carry = jnp.zeros((*x.shape[:-1], 2), x.dtype)
    am = np.asarray([[-a[1], 1.0], [-a[2], 0.0]], np.float32)   # [2, 2]
    cv = np.asarray([b[1] - a[1] * b[0], b[2] - a[2] * b[0]], np.float32)

    n = x.shape[-1]
    xt = jnp.moveaxis(x, -1, 0)                            # [N, ...]
    mats = jnp.broadcast_to(jnp.asarray(am), (n, *xt.shape[1:], 2, 2))
    offs = xt[..., None] * jnp.asarray(cv)                 # [N, ..., 2]
    # fold the incoming carry into the first step's offset: s[0] = A s_in + c[0]
    offs = offs.at[0].add(jnp.einsum("ij,...j->...i", jnp.asarray(am), carry,
                                     precision=jax.lax.Precision.HIGHEST))

    def combine(left, right):
        """(M1, v1) then (M2, v2): s -> M2 (M1 s + v1) + v2."""
        m1, v1 = left
        m2, v2 = right
        return (jnp.einsum("...ij,...jk->...ik", m2, m1,
                           precision=jax.lax.Precision.HIGHEST),
                jnp.einsum("...ij,...j->...i", m2, v1,
                           precision=jax.lax.Precision.HIGHEST) + v2)

    _, s = jax.lax.associative_scan(combine, (mats, offs), axis=0)  # [N, ..., 2]
    s_prev = jnp.concatenate([carry[None], jnp.moveaxis(s, 0, 0)[:-1]], axis=0)
    y = jnp.asarray(b[0], x.dtype) * xt + s_prev[..., 0]
    return jnp.moveaxis(y, 0, -1), s[-1]


def butter_lowpass_sos(cutoff_hz: float, fs: float) -> Tuple[np.ndarray, np.ndarray]:
    """2nd-order Butterworth low-pass (b, a) via the bilinear transform."""
    wc = np.tan(np.pi * cutoff_hz / fs)
    k1 = np.sqrt(2.0) * wc
    k2 = wc * wc
    norm = 1.0 + k1 + k2
    b = np.asarray([k2, 2 * k2, k2]) / norm
    a = np.asarray([1.0, 2.0 * (k2 - 1.0) / norm, (1.0 - k1 + k2) / norm])
    return b, a


# ---------------------------------------------------------------------------
# Mel filter bank
# ---------------------------------------------------------------------------

def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


def mel_filterbank(n_fft: int, n_mels: int, fs: float,
                   fmin: float = 0.0, fmax: Optional[float] = None
                   ) -> np.ndarray:
    """Triangular mel weights [n_mels, n_fft//2 + 1] (host constant)."""
    fmax = fmax if fmax is not None else fs / 2.0
    f = n_fft // 2 + 1
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    bins = np.floor((n_fft + 1) * hz_pts / fs).astype(int)
    w = np.zeros((n_mels, f), np.float32)
    for m in range(1, n_mels + 1):
        lo, ctr, hi = bins[m - 1], bins[m], bins[m + 1]
        for k in range(lo, min(ctr, f)):
            if ctr > lo:
                w[m - 1, k] = (k - lo) / (ctr - lo)
        for k in range(ctr, min(hi, f)):
            if hi > ctr:
                w[m - 1, k] = (hi - k) / (hi - ctr)
    return w


def mel_energies(power_spectra: jnp.ndarray, weights: np.ndarray) -> jnp.ndarray:
    """[..., F] power spectra → [..., n_mels] band energies (one matmul)."""
    return jnp.matmul(power_spectra, jnp.asarray(weights).T,
                      precision=jax.lax.Precision.HIGHEST)
