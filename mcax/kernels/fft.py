"""rFFT / irFFT kernels (component C3, SURVEY.md §2a — native tier).

The reference's hot inner loop is wipp_fft (Intel IPP ippsFFT or a generic
C fallback), called once per frame per channel (SURVEY.md §3.1).  TPUs have
no FFT unit; the TPU-native formulation is a *matmul-form real DFT*: every
frame of the block is one row of a [B, N] matrix multiplied by precomputed
[N, F] cosine/sine matrices on the MXU.  At the shipped sizes (N = 512..2048)
the O(N^2) matmul is tiny per frame and saturates the MXU when batched over
(channels x frames), which an O(N log N) scalar FFT cannot do on this
hardware (SURVEY.md §7.4 "FFT on TPU/Pallas").

Three implementations:
  * Pallas kernel (``pallas`` backend): tiled fused two-matmul producing the
    real and imaginary planes in one pass, fp32 accumulation on the MXU.
  * jnp matmul form: identical math via jnp.dot — used as the interpret-mode
    oracle and for platforms where Pallas is unavailable.
  * ``jnp.fft.rfft``/``irfft`` (``xla`` backend): XLA's decomposed FFT —
    bitwise-trusted correctness reference.

Public API is complex64-at-the-boundary so every algorithm above this module
is backend-agnostic: ``rfft(x) -> complex[..., F]``, ``irfft(y, n) -> real``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcax.kernels import dispatch

_LANE = 128      # TPU lane width: last-dim tiles must be multiples of this.
_SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Host-side DFT matrix precompute (float64 → float32, cached per size).
# ---------------------------------------------------------------------------

# Windows folded into the DFT matrices are registered host-side and keyed by
# content hash (lru_cache needs hashable keys; np arrays aren't).
_WINDOW_REGISTRY: dict = {}


def _register_window(window) -> str:
    if window is None:
        return ""
    w = np.asarray(window, np.float64)
    key = hashlib_sha1(w.tobytes())
    _WINDOW_REGISTRY.setdefault(key, w)
    return key


def hashlib_sha1(b: bytes) -> str:
    import hashlib
    return hashlib.sha1(b).hexdigest()


@functools.lru_cache(maxsize=None)
def _fwd_matrices(n: int, f_pad: int, win_key: str = ""):
    """Forward real-DFT matrices W st. X = (x·win) @ (Wr + j Wi), [N, Fp].

    An analysis window folds into the matrix rows (diag(win) @ W), so the
    windowing costs nothing at run time — one fewer full pass over the
    frame tensor."""
    f = n // 2 + 1
    k = np.arange(f)[None, :]                     # [1, F]
    t = np.arange(n)[:, None]                     # [N, 1]
    ang = -2.0 * np.pi * k * t / n
    win = (_WINDOW_REGISTRY[win_key][:, None] if win_key
           else np.ones((n, 1)))
    wr = np.zeros((n, f_pad), np.float64)
    wi = np.zeros((n, f_pad), np.float64)
    wr[:, :f] = np.cos(ang) * win
    wi[:, :f] = np.sin(ang) * win
    return wr.astype(np.float32), wi.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _inv_matrices(n: int, f_pad: int, win_key: str = ""):
    """Inverse matrices A st. x = Yre @ Ar + Yim @ Ai, shapes [Fp, N].

    Hermitian-symmetry expansion of the length-N inverse DFT of a half
    spectrum: x[t] = (1/N) [X0 + 2 sum_{k=1}^{N/2-1} (Xr cos - Xi sin)
    + X_{N/2} cos(pi t)].  A synthesis window folds into the matrix
    columns (A @ diag(win))."""
    f = n // 2 + 1
    k = np.arange(f)[:, None]                     # [F, 1]
    t = np.arange(n)[None, :]                     # [1, N]
    ang = 2.0 * np.pi * k * t / n
    alpha = np.full((f, 1), 2.0)
    alpha[0, 0] = 1.0
    alpha[-1, 0] = 1.0 if n % 2 == 0 else 2.0
    win = (_WINDOW_REGISTRY[win_key][None, :] if win_key
           else np.ones((1, n)))
    ar = np.zeros((f_pad, n), np.float64)
    ai = np.zeros((f_pad, n), np.float64)
    ar[:f] = alpha * np.cos(ang) / n * win
    ai[:f] = -alpha * np.sin(ang) / n * win
    return ar.astype(np.float32), ai.astype(np.float32)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _kernel_prec():
    """Mosaic supports only DEFAULT/HIGHEST dot precision — clamp the
    three-pass 'high' tier up to HIGHEST inside the Pallas kernels (this
    tier is the selectable alternative, not the shipped TPU auto path)."""
    p = _prec()
    return jax.lax.Precision.HIGHEST if p == jax.lax.Precision.HIGH else p


def _rdft_kernel(x_ref, wr_ref, wi_ref, yr_ref, yi_ref):
    x = x_ref[...]
    prec = _kernel_prec()              # true fp32 on the MXU by default
    yr_ref[...] = jnp.dot(x, wr_ref[...], preferred_element_type=jnp.float32,
                          precision=prec)
    yi_ref[...] = jnp.dot(x, wi_ref[...], preferred_element_type=jnp.float32,
                          precision=prec)


def _irdft_kernel(yr_ref, yi_ref, ar_ref, ai_ref, x_ref):
    prec = _kernel_prec()
    x_ref[...] = (
        jnp.dot(yr_ref[...], ar_ref[...], preferred_element_type=jnp.float32,
                precision=prec)
        + jnp.dot(yi_ref[...], ai_ref[...], preferred_element_type=jnp.float32,
                  precision=prec)
    )


def _pick_tiles(b: int, k: int, n_out: int, vmem_budget=14 * 2 ** 20):
    """Choose (TB, TN) tiles against the 16 MiB scoped-VMEM limit.

    Resident floats per grid step: weights 2*K*TN + io TB*(K + 2*TN), and
    Pallas DOUBLE-BUFFERS every block (pipeline prefetch), so the footprint
    is 2x that.  Shrink TN first (weights dominate), then TB.
    """
    def cost(tb_, tn_):
        return 4 * 2 * (2 * k * tn_ + tb_ * (k + 2 * tn_))

    # candidate tiles: lane-aligned divisors of the padded output width,
    # sublane-aligned divisors of the (rounded) batch
    tn_cands = [d for d in range(n_out, _LANE - 1, -_LANE)
                if n_out % d == 0] or [n_out]
    tb_full = min(_round_up(b, _SUBLANE), 512)
    tb_cands = [d for d in range(tb_full, _SUBLANE - 1, -_SUBLANE)
                if tb_full % d == 0] or [tb_full]
    for tn in tn_cands:
        for tb in tb_cands:
            if cost(tb, tn) <= vmem_budget:
                return tb, tn
    return tb_cands[-1], tn_cands[-1]


def _rdft_pallas(x2d: jnp.ndarray, n: int, win_key: str = ""):
    b = x2d.shape[0]
    f = n // 2 + 1
    f_pad = _round_up(f, _LANE)
    wr, wi = _fwd_matrices(n, f_pad, win_key)
    tb, tf = _pick_tiles(b, n, f_pad)
    b_pad = _round_up(b, tb)
    if b_pad != b:
        x2d = jnp.pad(x2d, ((0, b_pad - b), (0, 0)))
    grid = (b_pad // tb, f_pad // tf)
    yr, yi = pl.pallas_call(
        _rdft_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, n), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tf), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tf), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, tf), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, tf), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((b_pad, f_pad), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=4 * b_pad * n * f_pad,
            bytes_accessed=4 * (b_pad * n + 2 * n * f_pad + 2 * b_pad * f_pad),
            transcendentals=0,
        ),
        interpret=dispatch.interpret_mode(),
    )(x2d, jnp.asarray(wr), jnp.asarray(wi))
    return yr[:b, :f], yi[:b, :f]


def _irdft_pallas(yr2d: jnp.ndarray, yi2d: jnp.ndarray, n: int,
                  win_key: str = ""):
    b, f = yr2d.shape
    f_pad = _round_up(f, _SUBLANE)
    ar, ai = _inv_matrices(n, f_pad, win_key)
    tb, tn = _pick_tiles(b, f_pad, n)
    b_pad = _round_up(b, tb)
    if f_pad != f:
        yr2d = jnp.pad(yr2d, ((0, 0), (0, f_pad - f)))
        yi2d = jnp.pad(yi2d, ((0, 0), (0, f_pad - f)))
    if b_pad != b:
        yr2d = jnp.pad(yr2d, ((0, b_pad - b), (0, 0)))
        yi2d = jnp.pad(yi2d, ((0, b_pad - b), (0, 0)))
    grid = (b_pad // tb, n // tn)
    x = pl.pallas_call(
        _irdft_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, f_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, f_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f_pad, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((f_pad, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * b_pad * n * f_pad,
            bytes_accessed=4 * (2 * b_pad * f_pad + 2 * n * f_pad + b_pad * n),
            transcendentals=0,
        ),
        interpret=dispatch.interpret_mode(),
    )(yr2d, yi2d, jnp.asarray(ar), jnp.asarray(ai))
    return x[:b]


# ---------------------------------------------------------------------------
# jnp matmul form (oracle for the Pallas kernels; portable fallback)
# ---------------------------------------------------------------------------

def _prec():
    """MXU pass count for the DFT matmuls (MCAX_FFT_PRECISION).

    highest — bf16x6 ≈ true fp32: 142 dB forward SNR.  The default off
              TPU, and for any parity-critical A/B run (knob).
    high    — bf16x3: ~99 dB SNR, measured 1.26-1.28x faster standalone
              (PERF.md round 3).  The TPU default since r4: after the
              MVDR-solve kernel and the SRP grid inversion the two
              forward-DFT dots were 45% of the whole batched dispatch at
              75% of fp32 matmul speed-of-light (profile, PERF.md r4),
              and -99 dB is beyond 16-bit audio's 96 dB floor and any
              plausible reference SNR bound; the on-chip lane and
              --verify pin the math at `highest` explicitly.
    default — one bf16 pass: ~53 dB; diagnostics only.
    """
    import os
    fallback = ("high" if jax.default_backend() in ("tpu", "axon")
                else "highest")
    v = os.environ.get("MCAX_FFT_PRECISION", fallback).lower()
    table = {"default": jax.lax.Precision.DEFAULT,
             "high": jax.lax.Precision.HIGH,
             "highest": jax.lax.Precision.HIGHEST}
    if v not in table:
        raise ValueError(
            f"MCAX_FFT_PRECISION must be default|high|highest, got {v!r}")
    return table[v]


def rfft_matmul(x: jnp.ndarray, window=None) -> jnp.ndarray:
    n = x.shape[-1]
    wr, wi = _fwd_matrices(n, n // 2 + 1, _register_window(window))
    x = x.astype(jnp.float32)
    return jax.lax.complex(jnp.dot(x, wr, precision=_prec()),
                           jnp.dot(x, wi, precision=_prec()))


def irfft_matmul(y: jnp.ndarray, n: int, window=None) -> jnp.ndarray:
    ar, ai = _inv_matrices(n, y.shape[-1], _register_window(window))
    return (jnp.dot(jnp.real(y).astype(jnp.float32), ar, precision=_prec())
            + jnp.dot(jnp.imag(y).astype(jnp.float32), ai, precision=_prec()))


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def rfft(x: jnp.ndarray, window=None) -> jnp.ndarray:
    """Real FFT over the last axis: [..., N] float → [..., N//2+1] complex64.

    ``window`` (optional [N] host array) is an analysis window applied to
    every frame; on the matmul-DFT paths it folds into the DFT matrix for
    free, on the XLA-FFT path it is one explicit multiply.  Backend per
    ``dispatch.fft_backend()`` — auto ships the measured winner per size
    class (the XLA matmul emitter on TPU, jnp.fft elsewhere)."""
    n = x.shape[-1]
    b = dispatch.fft_backend()
    if b == "pallas":
        lead = x.shape[:-1]
        nb = int(np.prod(lead)) if lead else 1
        yr, yi = _rdft_pallas(x.reshape(nb, n).astype(jnp.float32), n,
                              _register_window(window))
        return jax.lax.complex(yr, yi).reshape(*lead, n // 2 + 1)
    if b == "matmul":
        return rfft_matmul(x, window)
    if window is not None:
        x = x * jnp.asarray(window, jnp.float32)
    return jnp.fft.rfft(x.astype(jnp.float32)).astype(jnp.complex64)


def irfft(y: jnp.ndarray, n: int, window=None) -> jnp.ndarray:
    """Inverse real FFT over the last axis: [..., F] complex → [..., n]
    float32.  ``window`` (optional [n]) is a synthesis window applied to
    every output frame (folded into the inverse matrix on matmul paths)."""
    b = dispatch.fft_backend()
    if b == "pallas":
        lead = y.shape[:-1]
        nb = int(np.prod(lead)) if lead else 1
        f = y.shape[-1]
        x = _irdft_pallas(jnp.real(y).reshape(nb, f).astype(jnp.float32),
                          jnp.imag(y).reshape(nb, f).astype(jnp.float32), n,
                          _register_window(window))
        return x.reshape(*lead, n)
    if b == "matmul":
        return irfft_matmul(y, n, window)
    out = jnp.fft.irfft(y, n=n).astype(jnp.float32)
    if window is not None:
        out = out * jnp.asarray(window, jnp.float32)
    return out
