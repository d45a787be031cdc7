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

import functools
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
    # explicit HIGHEST precision: the TPU default is a single bf16 pass
    # (~5e-3 absolute error at unit-scale signals — caught by the r5
    # on-chip lane extension); audio filtering is a precision tier, not a
    # throughput one, and FIR is on no acceptance config's hot path
    y = jax.lax.conv_general_dilated(
        flat, w.reshape(1, 1, k), window_strides=(1,), padding="VALID",
        precision=jax.lax.Precision.HIGHEST)
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

_BIQUAD_CHUNK = 128


@jax.tree_util.register_static
class _BiquadPlan:
    """Precomputed constant-matrix blocked-recurrence operators (fp64)."""

    def __init__(self, b, a, chunk: int):
        b = np.asarray(b, np.float64) / float(a[0])
        a = np.asarray(a, np.float64) / float(a[0])
        am = np.asarray([[-a[1], 1.0], [-a[2], 0.0]], np.float64)
        cv = np.asarray([b[1] - a[1] * b[0], b[2] - a[2] * b[0]], np.float64)
        pw = np.empty((chunk + 1, 2, 2), np.float64)       # A^d
        pw[0] = np.eye(2)
        for d in range(chunk):
            pw[d + 1] = pw[d] @ am
        g = pw[:, 0, :] @ cv                               # e1·A^d·c  [K+1]
        t = np.zeros((chunk, chunk), np.float64)           # Toeplitz taps
        for k in range(1, chunk):
            t[k, :k] = g[k - 1::-1]                        # g[k-1-j], j<k
        self.b0 = float(b[0])
        self.am, self.cv, self.pw = am, cv, pw
        self.T = jnp.asarray(t.T, jnp.float32)             # [K(j), K(k)]
        self.M = jnp.asarray(pw[:chunk, 0, :], jnp.float32)   # e1·A^k [K,2]
        self.W = jnp.asarray((pw[chunk - 1::-1] @ cv),
                             jnp.float32)                  # A^{K-1-j}c [K,2]
        self.D = jnp.asarray(pw[chunk], jnp.float32)       # A^K

    def tail_weights(self, r: int):
        """Operators giving the exact state after r (< chunk) samples of a
        chunk: state = A^r s_b + Wr^T x  (the padded-tail carry fix)."""
        wr = np.zeros((chunk_ := self.T.shape[0], 2), np.float64)
        if r:
            wr[:r] = self.pw[r - 1::-1][:r] @ self.cv      # A^{r-1-j}c, j<r
        return (jnp.asarray(self.pw[r], jnp.float32),
                jnp.asarray(wr, jnp.float32))


@functools.lru_cache(maxsize=64)
def _biquad_plan(b_key, a_key, chunk):
    return _BiquadPlan(b_key, a_key, chunk)


def biquad_apply(x: jnp.ndarray, b: np.ndarray, a: np.ndarray,
                 carry: Optional[jnp.ndarray] = None,
                 chunk: int = _BIQUAD_CHUNK
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Direct-form-II-transposed biquad as a blocked linear recurrence.

    y[n] = b0 x[n] + s1[n-1] with state s[n] = A s[n-1] + c x[n],
    A = [[-a1, 1], [-a2, 0]], c = [b1 - a1 b0, b2 - a2 b0] — all CONSTANT,
    so over a K-sample chunk the recurrence has the closed form

      y[k]     = b0 x[k] + (e1 A^k)·s_b + sum_{j<k} (e1 A^{k-1-j} c) x[j]
      s_b[i+1] = A^K s_b[i] + sum_{j<K} A^{K-1-j} c x[j]

    i.e. one [.., NC, K] @ [K, K] lower-triangular Toeplitz matmul for all
    within-chunk outputs (MXU), one skinny [K, 2] matmul for the chunk
    aggregates, and a tiny associative scan over the NC chunk boundaries.
    The round-3 form (associative_scan over per-SAMPLE [2, 2] transition
    matrices) materialised [N, ..., 2, 2] operands across log2(N) combine
    passes — measured ~0.02% of HBM speed-of-light (BENCH_DETAIL r3); the
    blocked form reads x once and does 2K MACs/sample on the MXU.
    Operators are precomputed in fp64 (A^d decays for any stable filter).

    Args:
      x: [..., N]; b: [3]; a: [3] with a[0] != 0.
      carry: [..., 2] filter state (s1, s2) from the previous block.
      chunk: block size K (128 = one MXU tile).
    Returns:
      (y [..., N], new_carry [..., 2]).
    """
    plan = _biquad_plan(tuple(np.asarray(b, np.float64).tolist()),
                        tuple(np.asarray(a, np.float64).tolist()), chunk)
    if carry is None:
        carry = jnp.zeros((*x.shape[:-1], 2), jnp.float32)
    n = x.shape[-1]
    nc = -(-n // chunk)
    r = n - (nc - 1) * chunk                   # valid samples in last chunk
    lead = x.shape[:-1]
    xp = jnp.pad(x, [(0, 0)] * len(lead) + [(0, nc * chunk - n)])
    xc = xp.reshape(*lead, nc, chunk)                       # [..., NC, K]

    hp = jax.lax.Precision.HIGHEST
    agg = jnp.einsum("...nk,ks->...ns", xc, plan.W, precision=hp)
    # boundary states: t[i] = D t[i-1] + agg[i], t[-1] = carry (inclusive);
    # constant-D associative scan over [NC] of tiny [2]-vectors
    mats = jnp.broadcast_to(plan.D, (nc, 2, 2))
    offs = jnp.moveaxis(agg, -2, 0)                          # [NC, ..., 2]
    offs = offs.at[0].add(jnp.einsum("ij,...j->...i", plan.D, carry,
                                     precision=hp))

    def combine(left, right):
        m1, v1 = left
        m2, v2 = right
        return (jnp.einsum("nij,njk->nik", m2, m1, precision=hp),
                jnp.einsum("nij,n...j->n...i", m2, v1, precision=hp) + v2)

    _, t_inc = jax.lax.associative_scan(combine, (mats, offs), axis=0)
    s_b = jnp.concatenate([jnp.broadcast_to(carry, (1, *lead, 2)),
                           t_inc[:-1]], axis=0)              # state BEFORE i
    s_b = jnp.moveaxis(s_b, 0, -2)                           # [..., NC, 2]

    y = (jnp.float32(plan.b0) * xc
         + jnp.einsum("...nj,jk->...nk", xc, plan.T, precision=hp)
         + jnp.einsum("...ns,ks->...nk", s_b, plan.M, precision=hp))
    y = y.reshape(*lead, nc * chunk)[..., :n]

    if r == chunk:
        new_carry = jnp.moveaxis(t_inc, 0, -2)[..., -1, :]
    else:
        ar, wr = plan.tail_weights(r)
        new_carry = (jnp.einsum("ij,...j->...i", ar, s_b[..., -1, :],
                                precision=hp)
                     + jnp.einsum("...k,ks->...s", xc[..., -1, :], wr,
                                  precision=hp))
    # carry in x.dtype, matching the old associative-scan contract: the
    # plan operators compute through fp32 internally, but a float64
    # caller round-tripping the carry must not silently lose its dtype
    # (ADVICE r4)
    return y.astype(x.dtype), new_carry.astype(x.dtype)


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
