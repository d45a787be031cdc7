"""GCC-PHAT cross-correlation, TDOA and 2-mic DOA (component C5).

Re-designs the reference's 2-mic "binaural localisation" module (mcarray;
SURVEY.md §3.2): PHAT-weighted cross-power spectrum → inverse FFT → restricted
-lag peak pick → parabolic (fractional-lag) interpolation → TDOA →
theta = arccos(tau c / d) off the pair baseline.

All frames of all pairs in a block are processed in one jitted batch; the
peak search is a masked argmax over a static lag window (max over pairs of
the per-pair physical lag bound), with per-pair masks applying the exact
bound — XLA-friendly static shapes, no data-dependent control flow.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from mcax import geometry as geo
from mcax.kernels import cps as kcps
from mcax.kernels import fft as kfft


@dataclasses.dataclass(frozen=True)
class GccPlan:
    """Host-side static plan for a GCC-PHAT run over an array geometry."""
    n_fft: int
    max_lag: int                 # window half-width = max over pairs
    lag_offsets: np.ndarray      # [2*max_lag+1] int32, values -max_lag..max_lag
    gather_idx: np.ndarray       # [2*max_lag+1] int32 circular-lag gather
    pair_mask: np.ndarray        # [P, 2*max_lag+1] bool: |lag| <= per-pair bound
    pair_distance: np.ndarray    # [P] float32 metres
    sample_rate: float
    speed_of_sound: float
    band_mask: np.ndarray = None   # [F] float32 bin weights (sub-band), or None


def make_plan(geom: geo.ArrayGeometry, n_fft: int,
              band_hz=None) -> GccPlan:
    per_pair = geom.max_lag_samples()                      # [P]
    max_lag = int(min(int(per_pair.max()), n_fft // 2 - 2))
    # gather one extra lag each side so a peak at +-max_lag (endfire) still
    # has both neighbors for parabolic interpolation; the search mask keeps
    # the physical +-max_lag bound.
    lags = np.arange(-(max_lag + 1), max_lag + 2, dtype=np.int32)
    gather = np.where(lags < 0, lags + n_fft, lags).astype(np.int32)
    mask = np.abs(lags)[None, :] <= np.minimum(per_pair, max_lag)[:, None]
    return GccPlan(
        n_fft=n_fft,
        max_lag=max_lag,
        lag_offsets=lags,
        gather_idx=gather,
        pair_mask=mask,
        pair_distance=geom.pair_distances().astype(np.float32),
        sample_rate=float(geom.sample_rate),
        speed_of_sound=float(geom.speed_of_sound),
        band_mask=(None if band_hz is None else
                   _band_mask(n_fft, geom.sample_rate, band_hz)),
    )


def _band_mask(n_fft: int, sample_rate: float, band_hz) -> np.ndarray:
    """[F] float32 weights restricting the cross-correlation to a frequency
    band (the dspone SubBandSTFT analogue for the 2-mic path)."""
    f = n_fft // 2 + 1
    freqs = sample_rate * np.arange(f) / n_fft
    lo, hi = band_hz
    return ((freqs >= lo) & (freqs <= hi)).astype(np.float32)


def cross_correlation(g_phat: jnp.ndarray, plan: GccPlan) -> jnp.ndarray:
    """PHAT cross-correlation restricted to physical lags.

    Args:
      g_phat: complex64 [..., P, T, F] PHAT-weighted CPS.
    Returns:
      float32 cc [..., P, T, 2*max_lag+1]; lag axis runs -max_lag..+max_lag.
    """
    cc_full = kfft.irfft(g_phat, plan.n_fft)               # circular lags
    return cc_full[..., jnp.asarray(plan.gather_idx)]


def parabolic_offset(ym1: jnp.ndarray, y0: jnp.ndarray,
                     yp1: jnp.ndarray) -> jnp.ndarray:
    """Fractional peak offset in (-0.5, 0.5) from 3-point parabola fit."""
    denom = ym1 - 2.0 * y0 + yp1
    delta = 0.5 * (ym1 - yp1) / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
    return jnp.clip(jnp.where(jnp.abs(denom) > 1e-12, delta, 0.0), -0.5, 0.5)


def tdoa(g_phat: jnp.ndarray, plan: GccPlan,
         interpolate: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pair, per-frame TDOA estimates.

    Returns:
      (tdoa_s, peak): both [..., P, T] float32 — TDOA in seconds (with
      optional parabolic fractional-lag refinement) and the cc peak value.
    """
    cc = cross_correlation(g_phat, plan)                   # [..., P, T, W]
    mask = jnp.asarray(plan.pair_mask)[..., :, None, :]    # [P, 1, W]
    neg = jnp.finfo(cc.dtype).min
    cc_m = jnp.where(mask, cc, neg)
    k = jnp.argmax(cc_m, axis=-1)                          # [..., P, T]
    peak = jnp.take_along_axis(cc_m, k[..., None], axis=-1)[..., 0]
    lag = jnp.asarray(plan.lag_offsets, jnp.float32)[k]
    if interpolate:
        w = cc.shape[-1]
        km1 = jnp.clip(k - 1, 0, w - 1)
        kp1 = jnp.clip(k + 1, 0, w - 1)
        ym1 = jnp.take_along_axis(cc, km1[..., None], axis=-1)[..., 0]
        yp1 = jnp.take_along_axis(cc, kp1[..., None], axis=-1)[..., 0]
        interior = (k > 0) & (k < w - 1)
        lag = lag + jnp.where(interior, parabolic_offset(ym1, peak, yp1), 0.0)
    return lag / jnp.float32(plan.sample_rate), peak


def doa_from_tdoa(tdoa_s: jnp.ndarray, plan: GccPlan) -> jnp.ndarray:
    """Per-pair far-field DOA: theta = arccos(tau*c/d) in [0, pi] measured
    from the pair baseline r_j - r_i (front-back ambiguous). [..., P, T]."""
    d = jnp.asarray(plan.pair_distance)[..., :, None]
    s = jnp.clip(tdoa_s * jnp.float32(plan.speed_of_sound) / d, -1.0, 1.0)
    return jnp.arccos(s)


def multiband_masks(n_fft: int, sample_rate: float, num_bands: int,
                    scale: str = "mel", fmin: float = 50.0,
                    fmax: float = None) -> np.ndarray:
    """[B, F] float32 band masks partitioning the half spectrum.

    The reference's dspone ``SubBandSTFT`` hands each sub-band to the
    algorithm independently (mcarray's multiband binaural localisation
    builds per-band estimates and fuses them); these masks are the batched
    equivalent — one static weight row per band, applied to the PHAT CPS.
    scale: "mel" (mel-spaced edges, like a filter-bank split) or "linear".
    """
    f = n_fft // 2 + 1
    freqs = sample_rate * np.arange(f) / n_fft
    fmax = sample_rate / 2 if fmax is None else fmax
    if scale == "mel":
        def to_mel(hz):
            return 2595.0 * np.log10(1.0 + np.asarray(hz) / 700.0)
        def from_mel(m):
            return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
        edges = from_mel(np.linspace(to_mel(fmin), to_mel(fmax),
                                     num_bands + 1))
    elif scale == "linear":
        edges = np.linspace(fmin, fmax, num_bands + 1)
    else:
        raise ValueError(f"scale must be mel|linear, got {scale!r}")
    masks = np.zeros((num_bands, f), np.float32)
    for b in range(num_bands):
        lo, hi = edges[b], edges[b + 1]
        masks[b] = (freqs >= lo) & (freqs < hi if b + 1 < num_bands
                                    else freqs <= hi)
    return masks


def gcc_phat_multiband(spectra: jnp.ndarray, pairs: np.ndarray, plan: GccPlan,
                       band_masks: np.ndarray,
                       eps: float = kcps.DEFAULT_PHAT_EPS,
                       interpolate: bool = True, weighting: str = "phat"):
    """Sub-band GCC: independent per-band TDOA/DOA, confidence-fused.

    Each band's PHAT CPS is cross-correlated and peak-picked separately
    (one batched irfft over a leading band axis), then the per-band TDOAs
    are fused with weights = relu(peak) per band — bands where the source
    has no energy contribute ~0.  This is the behavioral analogue of the
    reference's sub-band localisation (dspone SubBandSTFT + mcarray
    multiband binaural module, SURVEY.md §2b), re-designed as one jitted
    batch instead of a per-band object loop.

    Args:
      spectra: complex64 [C, T, F]; band_masks: [B, F] (multiband_masks).
    Returns:
      dict with per-band tdoa/doa/peak [B, P, T] and fused tdoa/doa [P, T].
    """
    g = kcps.cps_weighted(spectra, pairs, weighting=weighting, eps=eps)
    masks = jnp.asarray(band_masks, jnp.float32)
    gb = g[None] * masks[:, None, None, :].astype(g.dtype)
    tau, peak = tdoa(gb, plan, interpolate=interpolate)    # [B, P, T]
    # fusion weight = per-bin coherence^4: a PHAT cc peak grows with the
    # number of bins in the band (each whitened bin contributes 2/n_fft via
    # Hermitian symmetry), so the raw peak would let wide-but-ambiguous
    # bands dominate; normalising by 2*width/n_fft gives a [0,1] coherence,
    # and the 4th power strongly downweights partially-coherent bands
    width = jnp.sum(masks, axis=-1)                        # [B]
    coherence = peak * jnp.float32(plan.n_fft) / (
        2.0 * jnp.maximum(width, 1.0)[:, None, None])
    w = jnp.clip(coherence, 0.0, 1.0) ** 4
    wsum = jnp.sum(w, axis=0)
    tau_fused = jnp.sum(w * tau, axis=0) / jnp.where(wsum > 1e-12, wsum, 1.0)
    return {"tdoa": tau, "doa": doa_from_tdoa(tau, plan), "peak": peak,
            "tdoa_fused": tau_fused,
            "doa_fused": doa_from_tdoa(tau_fused, plan)}


def gcc_phat_block(spectra: jnp.ndarray, pairs: np.ndarray, plan: GccPlan,
                   eps: float = kcps.DEFAULT_PHAT_EPS,
                   interpolate: bool = True, weighting: str = "phat"):
    """Full GCC chain for one block of spectra (SURVEY.md §3.2).

    Args:
      spectra: complex64 [..., C, T, F].
      weighting: phat|scot|roth|cc (kernels.cps.cps_weighted).
    Returns:
      dict with tdoa [..., P, T] (s), doa [..., P, T] (rad), peak [..., P, T].
    """
    g = kcps.cps_weighted(spectra, pairs, weighting=weighting, eps=eps)
    if plan.band_mask is not None:
        g = g * jnp.asarray(plan.band_mask, g.dtype)
    tau, peak = tdoa(g, plan, interpolate=interpolate)
    return {"tdoa": tau, "doa": doa_from_tdoa(tau, plan), "peak": peak}
