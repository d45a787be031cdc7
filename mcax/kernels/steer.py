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

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcax import geometry as geo
from mcax.kernels import dispatch

_LANE = 128
_SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _steer_kernel(gr_ref, gi_ref, er_ref, ei_ref, out_ref):
    """One (B, G) output tile: accumulate the fused dual matmul over K tiles
    (K = pair*bin).  The steering matrices stream through VMEM once per
    (i, j) tile column; the subtraction fuses into the MXU epilogue."""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)
    # HIGHEST: the surface feeds a DOA argmax and the parity tests hold it
    # to fp32 accuracy; Mosaic's default dot precision is bf16 passes,
    # whose ~8e-3 relative error fails the on-chip lane (r4)
    out_ref[...] += (
        jnp.dot(gr_ref[...], er_ref[...], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        - jnp.dot(gi_ref[...], ei_ref[...], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    )


def _pick_tiles(b: int, k: int, g: int, vmem_budget=12 * 2 ** 20):
    """(tb, tk, tg) against the 16 MiB scoped-VMEM limit.

    HBM-traffic model: the steering tiles stream once per M-tile (K is the
    accumulation axis, G usually fits one tile), so traffic ≈
    B/tb * 2*K*G*4 bytes + the two [B, K] input planes read once.  That
    makes a LARGE tb the first priority (fewer E re-streams) and tk only a
    VMEM knob — round 1's heuristic did the opposite (tb=128/tk=512 at the
    batched M=1536 shape → 2.3x slower than XLA; tb=512/tk=512 beats it).
    Resident fp32 per step: two [tb, tk] inputs, two [tk, tg] steering
    tiles (double-buffered by the pipeline), one [tb, tg] accumulator."""
    tb = min(_round_up(b, _SUBLANE), 512)
    tg = min(_round_up(g, _LANE), 512)
    tk = min(_round_up(k, _LANE), 1024)

    def cost(tb_, tk_, tg_):
        return 4 * (2 * (2 * tb_ * tk_ + 2 * tk_ * tg_) + tb_ * tg_)

    while cost(tb, tk, tg) > vmem_budget and tk > 256:
        tk //= 2
    while cost(tb, tk, tg) > vmem_budget and tb > 64:
        tb //= 2
    while cost(tb, tk, tg) > vmem_budget and tg > _LANE:
        tg //= 2
    return tb, tk, tg


def _srp_power_pallas(gr: jnp.ndarray, gi: jnp.ndarray,
                      e_re: jnp.ndarray, e_im: jnp.ndarray) -> jnp.ndarray:
    """gr/gi [B, K] @ e [K, G] -> power [B, G], tiled with K-accumulation."""
    b, k = gr.shape
    g = e_re.shape[1]
    tb, tk, tg = _pick_tiles(b, k, g)
    b_pad, g_pad, k_pad = _round_up(b, tb), _round_up(g, tg), _round_up(k, tk)
    gr = jnp.pad(gr, ((0, b_pad - b), (0, k_pad - k)))
    gi = jnp.pad(gi, ((0, b_pad - b), (0, k_pad - k)))
    e_re = jnp.pad(e_re, ((0, k_pad - k), (0, g_pad - g)))
    e_im = jnp.pad(e_im, ((0, k_pad - k), (0, g_pad - g)))
    grid = (b_pad // tb, g_pad // tg, k_pad // tk)
    out = pl.pallas_call(
        _steer_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, tk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, tk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tg), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tg), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, tg), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, g_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b_pad * k_pad * g_pad,
            bytes_accessed=4 * (2 * b_pad * k_pad + 2 * k_pad * g_pad
                                + b_pad * g_pad),
            transcendentals=0,
        ),
        interpret=dispatch.interpret_mode(),
    )(gr, gi, e_re, e_im)
    return out[:b, :g]


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


def srp_power_flat(gr: jnp.ndarray, gi: jnp.ndarray, e_re: jnp.ndarray,
                   e_im: jnp.ndarray) -> jnp.ndarray:
    """Steered power from pre-flattened CPS planes [..., T, P*F]."""
    *lead, t, k = gr.shape
    er = jnp.asarray(e_re)
    ei = jnp.asarray(e_im)
    # the hand-tiled Pallas matmul only when explicitly selected
    # (MCAX_SRP=matmul): measured on v5e, XLA's own matmul pipelining beats
    # it at every shipped shape (BENCH_DETAIL round 2), and the fused
    # on-chip-steering kernel (srp_fused.py) beats both
    if dispatch.use_pallas() and dispatch.srp_backend() == "matmul":
        b = int(np.prod([*lead, t])) if (lead or t) else 1
        out = _srp_power_pallas(gr.reshape(b, k), gi.reshape(b, k), er, ei)
        return out.reshape(*lead, t, er.shape[-1])
    # HIGHEST: TPU default matmul precision is one bf16 pass (~53 dB),
    # visibly off the fused kernel's fp32 surface; the xla path ships only
    # at floor-bound latency shapes and on CPU, where HIGHEST is free
    hp = jax.lax.Precision.HIGHEST
    return (jnp.matmul(gr, er, precision=hp)
            - jnp.matmul(gi, ei, precision=hp))


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
    return srp_power_flat(gr, gi, e_re, e_im)
