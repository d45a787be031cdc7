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

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcax.kernels import dispatch

DEFAULT_PHAT_EPS = 1e-12

_LANE = 128
_SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _cps_phat_kernel(eps, ar_ref, ai_ref, br_ref, bi_ref, gr_ref, gi_ref):
    """Fused complex multiply-conjugate + PHAT normalise, one VPU pass."""
    ar, ai = ar_ref[...], ai_ref[...]
    br, bi = br_ref[...], bi_ref[...]
    gr = ar * br + ai * bi
    gi = ai * br - ar * bi
    w = 1.0 / (jnp.sqrt(gr * gr + gi * gi) + np.float32(eps))
    gr_ref[...] = gr * w
    gi_ref[...] = gi * w


def _pick_rows(b: int, f_pad: int, vmem_budget=8 * 2 ** 20) -> int:
    """Row-tile size against the 16 MiB scoped-VMEM limit: 6 resident
    [tb, f_pad] fp32 planes (4 in + 2 out), each double-buffered by the
    Pallas pipeline.  The budget is deliberately conservative (half the
    limit): Mosaic's stack accounting charges more than the raw plane
    bytes (measured 18.2 MiB where this model said 13.8)."""
    tb = min(_round_up(b, _SUBLANE), 1024)
    while tb > _SUBLANE and 4 * 2 * 6 * tb * f_pad > vmem_budget:
        tb -= _SUBLANE
    return tb


def _cps_phat_pallas(ar, ai, br, bi, eps: float):
    """[B, F] float32 planes -> PHAT-weighted CPS planes. Padded to lanes."""
    b, f = ar.shape
    f_pad = _round_up(f, _LANE)
    tb = _pick_rows(b, f_pad)
    b_pad = _round_up(b, tb)
    def pad(x):
        return jnp.pad(x, ((0, b_pad - b), (0, f_pad - f)))
    spec = pl.BlockSpec((tb, f_pad), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    gr, gi = pl.pallas_call(
        functools.partial(_cps_phat_kernel, float(eps)),
        grid=(b_pad // tb,),
        in_specs=[spec] * 4,
        out_specs=[spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((b_pad, f_pad), jnp.float32)] * 2,
        interpret=dispatch.interpret_mode(),
    )(pad(ar), pad(ai), pad(br), pad(bi))
    return gr[:b, :f], gi[:b, :f]


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


def cps_phat_pairs(xi: jnp.ndarray, xj: jnp.ndarray,
                   eps: float = DEFAULT_PHAT_EPS) -> jnp.ndarray:
    """PHAT-weighted cross-power of already-gathered pair spectra.

    xi, xj: complex64 [..., F] (any leading layout — the caller chooses the
    output layout by how it gathered the pairs).  Fused VPU kernel on the
    Pallas backend, one XLA fusion otherwise.
    """
    if dispatch.use_pallas():
        *lead, f = xi.shape
        b = int(np.prod(lead)) if lead else 1
        gr, gi = _cps_phat_pallas(
            jnp.real(xi).reshape(b, f), jnp.imag(xi).reshape(b, f),
            jnp.real(xj).reshape(b, f), jnp.imag(xj).reshape(b, f), eps)
        return jax.lax.complex(gr, gi).reshape(*lead, f)
    return phat_weight(xi * jnp.conj(xj), eps)


def cps_phat(spectra: jnp.ndarray, pairs: np.ndarray,
             eps: float = DEFAULT_PHAT_EPS,
             weighted: bool = True) -> jnp.ndarray:
    """Fused pair cross-power spectrum with optional PHAT weighting.

    The single entry point used by GCC (SURVEY.md §3.2) and SRP (§3.3).
    On the Pallas backend the complex multiply + magnitude + reciprocal run
    as one fused VPU kernel over the gathered pair planes.
    """
    if weighted:
        i = jnp.asarray(pairs[:, 0])
        j = jnp.asarray(pairs[:, 1])
        xi = jnp.take(spectra, i, axis=-3)
        xj = jnp.take(spectra, j, axis=-3)
        return cps_phat_pairs(xi, xj, eps)
    return cross_power(spectra, pairs)


def cps_weighted(spectra: jnp.ndarray, pairs: np.ndarray,
                 weighting: str = "phat",
                 eps: float = DEFAULT_PHAT_EPS) -> jnp.ndarray:
    """Generalised cross-correlation weightings (Knapp & Carter family).

    The reference's GCC module exposes PHAT; the framework carries the full
    classic set as a parity/experimentation knob (PAPERS.md GCC literature):

      phat  G / |G|                 (phase transform — the default)
      scot  G / sqrt(S_ii S_jj)     (smoothed coherence transform)
      roth  G / S_ii                (Roth impulse-response weighting)
      cc    G                       (plain cross-correlation)
    """
    if weighting == "phat":
        return cps_phat(spectra, pairs, eps=eps)
    g = cross_power(spectra, pairs)
    if weighting == "cc":
        return g
    i = jnp.asarray(pairs[:, 0])
    j = jnp.asarray(pairs[:, 1])
    auto = jnp.real(spectra * jnp.conj(spectra))           # [..., C, T, F]
    s_ii = jnp.take(auto, i, axis=-3)
    if weighting == "roth":
        return g / (s_ii + jnp.asarray(eps, s_ii.dtype))
    if weighting == "scot":
        s_jj = jnp.take(auto, j, axis=-3)
        return g / (jnp.sqrt(s_ii * s_jj) + jnp.asarray(eps, s_ii.dtype))
    raise ValueError(f"unknown GCC weighting {weighting!r}; "
                     "have phat|scot|roth|cc")


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
