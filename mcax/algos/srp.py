"""SRP-PHAT steered-power DOA over a candidate grid (component C6).

Reference analogue: mcarray's multi-mic SRP-PHAT localisation module built on
dspone's SubBandSTFT (SURVEY.md §3.3) — a triple loop over (grid, pair, bin)
per frame.  Here the whole block is two real matmuls on the MXU
(kernels.steer.srp_power) over the PHAT-weighted cross-power spectra, then a
device-side argmax so no per-frame host round-trip is needed.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mcax import geometry as geo
from mcax.kernels import cps as kcps
from mcax.kernels import dispatch
from mcax.kernels import steer as ksteer


@dataclasses.dataclass(frozen=True)
class SrpPlan:
    """Static plan: steering matrices + grid for a geometry/FFT size."""
    n_fft: int
    azimuths_rad: np.ndarray       # [G]
    e_re: np.ndarray               # [P*F, G]
    e_im: np.ndarray               # [P*F, G]
    steer_re: np.ndarray           # [G, C, F] per-mic steering vector (cos)
    steer_im: np.ndarray           # [G, C, F] (sin); v = e^{-j omega t_c}
    # raw ingredients for the fused on-chip-steering kernel
    # (kernels/srp_fused.py): pair TDOAs, bin frequencies, band mask
    tau_pg: np.ndarray = None      # [P, G] seconds
    omega: np.ndarray = None       # [F] rad/s
    band_mask: np.ndarray = None   # [F] float32 (None = all-pass)


def band_bins(n_fft: int, sample_rate: float, band_hz) -> np.ndarray:
    """Boolean bin mask [F] for a (lo, hi) Hz band; all-True when None.
    The sub-band restriction of dspone's SubBandSTFT, as a static mask."""
    f = n_fft // 2 + 1
    if band_hz is None:
        return np.ones(f, bool)
    freqs = sample_rate * np.arange(f) / n_fft
    lo, hi = band_hz
    return (freqs >= lo) & (freqs <= hi)


def make_plan(geom: geo.ArrayGeometry, n_fft: int,
              grid_points: int = 360, band_hz=None) -> SrpPlan:
    az = geo.azimuth_grid(grid_points)
    e_re, e_im = ksteer.steering_matrices(geom, az, n_fft)
    f = n_fft // 2 + 1
    band_mask = None
    if band_hz is not None:
        # zero steering rows outside the band: those bins contribute no power
        mask = band_bins(n_fft, geom.sample_rate, band_hz)
        p = geom.num_pairs
        keep = np.tile(mask, p).astype(np.float32)[:, None]   # [P*F, 1]
        e_re = e_re * keep
        e_im = e_im * keep
        band_mask = mask.astype(np.float32)
    omega = 2.0 * np.pi * geom.sample_rate * np.arange(f) / n_fft
    t = geom.mic_delays(az)                                # [G, C] seconds
    phase = -omega[None, None, :] * t[:, :, None]          # [G, C, F]
    return SrpPlan(n_fft=n_fft, azimuths_rad=az,
                   e_re=e_re, e_im=e_im,
                   steer_re=np.cos(phase).astype(np.float32),
                   steer_im=np.sin(phase).astype(np.float32),
                   tau_pg=np.ascontiguousarray(
                       geom.pair_tdoas(az).T).astype(np.float32),
                   omega=omega.astype(np.float32),
                   band_mask=band_mask)


def srp_surface(spectra: jnp.ndarray, pairs: np.ndarray, plan: SrpPlan,
                eps: float = kcps.DEFAULT_PHAT_EPS) -> jnp.ndarray:
    """Steered-power surface per frame: [..., C, T, F] → [..., T, G].

    Layout: the C-spectra are transposed to [..., T, C, F] *before* the pair
    gather, so the PHAT CPS lands directly in the [..., T, P, F] layout the
    steering matmul consumes ([..., T, P·F] is then a free reshape) — one
    small transpose instead of transposing the P/C-times-larger CPS tensor.

    Backend (kernels.dispatch.srp_backend): "fused" runs the single-pass
    Pallas kernel that keeps the CPS in VMEM and rematerialises the
    steering phases on-chip (kernels/srp_fused.py); otherwise the CPS is
    materialised and fed to the dual steering matmul (XLA or Pallas).
    """
    *lead_, c_, t_, _f = spectra.shape
    m_hint = int(np.prod([*lead_, t_])) if (lead_ or t_) else 1
    if dispatch.srp_backend(m=m_hint) == "fused" and plan.tau_pg is not None:
        from mcax.kernels import srp_fused
        *lead, c, t, f = spectra.shape
        m = int(np.prod([*lead, t])) if (lead or t) else 1
        # channel-major [C, M, F]: the pipeline's native layout, no
        # transpose needed (lead/batch axes fold into M)
        sc = (jnp.moveaxis(spectra, -3, 0).reshape(c, m, f)
              if lead else spectra)
        if plan.band_mask is not None:
            sc = sc * jnp.asarray(plan.band_mask)          # masked bins → 0
        out = srp_fused.srp_power_fused(
            jnp.real(sc), jnp.imag(sc), pairs, plan.tau_pg, plan.omega,
            len(plan.azimuths_rad), eps)
        return out.reshape(*lead, t, out.shape[-1])
    st = jnp.moveaxis(spectra, -3, -2)                     # [..., T, C, F]
    i = jnp.asarray(pairs[:, 0])
    j = jnp.asarray(pairs[:, 1])
    xi = jnp.take(st, i, axis=-2)                          # [..., T, P, F]
    xj = jnp.take(st, j, axis=-2)
    g = kcps.cps_phat_pairs(xi, xj, eps)
    *lead, t, p, f = g.shape
    gr = jnp.real(g).reshape(*lead, t, p * f)
    gi = jnp.imag(g).reshape(*lead, t, p * f)
    return ksteer.srp_power_flat(gr, gi, plan.e_re, plan.e_im)


def argmax_doa(power: jnp.ndarray, plan: SrpPlan, interpolate: bool = False):
    """(azimuth_rad, power_at_peak) from a power surface [..., G].

    With ``interpolate`` a circular 3-point parabolic fit refines the DOA to
    sub-grid resolution (the SRP analogue of GCC's fractional-lag peak)."""
    g = power.shape[-1]
    k = jnp.argmax(power, axis=-1)
    az = jnp.asarray(plan.azimuths_rad, jnp.float32)[k]
    pk = jnp.take_along_axis(power, k[..., None], axis=-1)[..., 0]
    if interpolate:
        km1 = (k - 1) % g
        kp1 = (k + 1) % g
        ym1 = jnp.take_along_axis(power, km1[..., None], axis=-1)[..., 0]
        yp1 = jnp.take_along_axis(power, kp1[..., None], axis=-1)[..., 0]
        denom = ym1 - 2.0 * pk + yp1
        delta = jnp.where(jnp.abs(denom) > 1e-12,
                          0.5 * (ym1 - yp1) / denom, 0.0)
        delta = jnp.clip(delta, -0.5, 0.5)
        step = jnp.float32(plan.azimuths_rad[1] - plan.azimuths_rad[0])
        az = az + delta * step
    return az, pk


def steering_vector(plan: SrpPlan, grid_idx: jnp.ndarray) -> jnp.ndarray:
    """Gather the complex steering vector v = e^{-j omega t_c(theta_g)}.

    grid_idx: int [...] → complex64 [..., C, F].  Used to hand an SRP (or
    tracker) DOA to the delay-sum / MVDR beamformers without leaving device.
    """
    vr = jnp.take(jnp.asarray(plan.steer_re), grid_idx, axis=0)
    vi = jnp.take(jnp.asarray(plan.steer_im), grid_idx, axis=0)
    return jax.lax.complex(vr, vi)
