"""Fused SRP-PHAT steered-power kernel (C4+C6 native tier, single pass).

The round-1 native tier ran SRP as two kernels — a VPU CPS+PHAT pass that
MATERIALISES the [M, P, F] cross-power tensor to HBM (~350 MB round trip at
the batched config-4 shape) and a dual steering matmul that re-reads it plus
streams the precomputed [P*F, G] steering matrices (~45 MB per M-tile).
Measured on the v5e, both it and the equivalent XLA fusion are HBM-bound at
~20-30% of matmul speed-of-light (BENCH_DETAIL round 2).

This kernel inverts the trade: steering phases are COMPUTED ON THE FLY
inside the kernel (cos/sin of omega_f * tau_p[g]) so the big [P*F, G]
steering matrices never exist — not in HBM, not even whole in VMEM.  Grid
= (pairs, M-tiles), pair OUTER, with the pair table scalar-prefetched into
SMEM; per pair the kernel

  1. synthesises the pair's steering tile  e^{j omega tau}  from the tiny
     [P, G] TDOA table + [1, F] omega row into VMEM scratch — ONCE,
     reused across every M-tile (the r4 grid inversion: recomputing it
     per (M-tile, pair) was the kernel's measured bottleneck),
  2. per M-tile fetches the pair's two channel slices of the frame-major
     spectra planes (BlockSpec index maps driven by the prefetched table),
  3. computes the PHAT-weighted CPS for the pair in VMEM,
  4. accumulates  Re(G . E)  with two MXU matmuls (bf16 passes by default
     on the real chip — see _use_bf16) into the output tile, which is
     revisited and accumulated in place across the outer pair loop.

HBM traffic: spectra slices (2 channels x 2 planes per pair) + the [M, G]
output once per pair — no CPS tensor, no steering matrices.  Reference analogue:
the mcarray SRP-PHAT module's (grid x pair x bin) triple loop (SURVEY.md
§3.3), collapsed to MXU matmuls with the steering table rematerialised
on-chip — a TPU-only design point (the C++/IPP reference has the opposite
trade: memory is cheap there, FLOPs are not).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcax.kernels import dispatch

_LANE = 128
_SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _use_bf16() -> bool:
    """bf16 MXU passes for the steering matmuls (fp32 accumulate).

    Measured r4, AFTER the pair-outer grid inversion: bf16 is SLOWER than
    fp32 at the batched config-4 shape (1.62 vs 1.52 ms standalone) — the
    per-step f32→bf16 casts and the (16, 128) retiling of operands that
    live in VMEM as (8, 128) f32 tiles cost more than the saved MXU
    passes — while also adding ~2e-3 surface error.  fp32 is therefore
    the default everywhere; the knob (MCAX_SRP_FUSED_BF16=1) remains for
    A/B runs on future hardware where the trade may flip."""
    return os.environ.get("MCAX_SRP_FUSED_BF16", "0") == "1"


def _pick_tb(f_pad: int, g_pad: int, vmem_budget=12 * 2 ** 20) -> int:
    """M-rows per tile.  Resident per step: 4 spectra slices [tb, f_pad]
    (double-buffered), the synthesised steering pair [f_pad, g_pad] x ~3
    temporaries, CPS temporaries, and the [tb, g_pad] output accumulator.
    Bigger tb = fewer cos/sin rematerialisations per pair — the dominant
    overhead at small tiles (measured: tb=64 spends ~4 ms in
    transcendentals at the batched config-4 shape; tb=384 ~0.3 ms)."""
    def cost(tb):
        spectra = 2 * 4 * tb * f_pad              # 4 slices, double-buffered
        temps = 4 * tb * f_pad                    # gr/gi/w + cast
        steer = 3 * f_pad * g_pad                 # ang + cos + sin
        out = 2 * tb * g_pad
        return 4 * (spectra + temps + steer + out)

    tb = 512
    while tb > _SUBLANE and cost(tb) > vmem_budget:
        tb -= 128 if tb > 128 else tb // 2
    return max(tb, _SUBLANE)


_PHASOR_SUB = 16    # twiddle split: f = a*_PHASOR_SUB + b


def _fused_kernel(eps: float, bf16: bool, domega,
                  pairs_ref, ar_ref, ai_ref, br_ref, bi_ref,
                  tau_ref, om_ref, out_ref, er_ref, ei_ref):
    k = pl.program_id(0)                                   # pair (outer)
    i = pl.program_id(1)                                   # M-tile (inner)

    @pl.when(i == 0)
    def _steer():
        # Steering tile for this pair, synthesised on-chip ONCE and kept
        # in VMEM scratch across all M-tiles (r4: with the old M-outer
        # grid this expansion re-ran per (M-tile, pair) and — together
        # with the spectra re-reads — was the kernel's real bottleneck;
        # an fp32->bf16 matmul A/B moved the total by only 2%).
        # E[f, g] = e^{+j omega_f tau_k[g]}  (sign matches steer.py)
        tau_row = tau_ref[k, :]                            # [g_pad]
        fp = er_ref.shape[0]
        gp = tau_row.shape[-1]
        if domega is not None:
            # Two-level phasor factorisation: omega_f = f*domega and
            # f = a*16 + b give E[f] = A[a]*B[b], A = e^{j*16a*domega*tau},
            # B = e^{j*b*domega*tau} — (fp/16 + 16) rows of cos/sin
            # instead of fp rows (~11x fewer transcendentals), then one
            # unit-phasor complex multiply per element (~1 ulp phase
            # error).  The omega ramp continues past F into the pad rows,
            # which multiply zeroed CPS — values moot.
            na = fp // _PHASOR_SUB
            ang_a = (jax.lax.broadcasted_iota(jnp.float32, (na, 1), 0)
                     * np.float32(_PHASOR_SUB * domega)) * tau_row[None, :]
            ang_b = (jax.lax.broadcasted_iota(jnp.float32,
                                              (_PHASOR_SUB, 1), 0)
                     * np.float32(domega)) * tau_row[None, :]
            ca, sa = jnp.cos(ang_a), jnp.sin(ang_a)        # [na, gp]
            cb, sb = jnp.cos(ang_b), jnp.sin(ang_b)        # [16, gp]
            er = (ca[:, None, :] * cb[None, :, :]
                  - sa[:, None, :] * sb[None, :, :]).reshape(fp, gp)
            ei = (sa[:, None, :] * cb[None, :, :]
                  + ca[:, None, :] * sb[None, :, :]).reshape(fp, gp)
        else:
            ang = om_ref[0, :][:, None] * tau_row[None, :]  # [f_pad, g_pad]
            er = jnp.cos(ang)
            ei = jnp.sin(ang)
        er_ref[...] = er.astype(er_ref.dtype)
        ei_ref[...] = ei.astype(ei_ref.dtype)

    @pl.when(k == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    ar, ai = ar_ref[0], ai_ref[0]                          # [tb, f_pad]
    br, bi = br_ref[0], bi_ref[0]
    gr = ar * br + ai * bi                                 # X_a conj(X_b)
    gi = ai * br - ar * bi
    # pairs_ref col 2 = validity (0 for pad rows of a pair-sharded slice:
    # their contribution must vanish; folded into the PHAT weight for free)
    valid = pairs_ref[k, 2].astype(jnp.float32)
    w = valid / (jnp.sqrt(gr * gr + gi * gi) + np.float32(eps))
    gr = gr * w
    gi = gi * w
    if bf16:
        gr, gi = gr.astype(jnp.bfloat16), gi.astype(jnp.bfloat16)
    out_ref[...] += (
        jnp.dot(gr, er_ref[...], preferred_element_type=jnp.float32)
        - jnp.dot(gi, ei_ref[...], preferred_element_type=jnp.float32))


def srp_power_fused(st_re: jnp.ndarray, st_im: jnp.ndarray,
                    pairs, tau, omega: np.ndarray,
                    grid_points: int, eps: float,
                    valid=None) -> jnp.ndarray:
    """Steered power from frame-major spectra planes.

    Args:
      st_re, st_im: float32 [C, M, F] (channel major — the pipeline's
        native spectra layout, so no transpose is needed).
      pairs: int32 [P, 2] — host constant OR a traced array (e.g. a
        shard_map operand carrying this device's pair slice; the table
        rides the scalar-prefetch path either way).
      tau: float32 [P, G] pair TDOAs (seconds) for the azimuth grid
        (host constant or traced per-shard slice).
      omega: float32 [F] bin angular frequencies (rad/s) — host constant.
      grid_points: G.
      eps: PHAT epsilon.
      valid: optional float32/int [P]; 0 kills a pair's contribution
        (pair-axis padding of a sharded slice). None = all valid.
    Returns:
      float32 [M, G] steered response power.
    """
    c, m, f = st_re.shape
    p = pairs.shape[0]
    g = grid_points
    f_pad = _round_up(f, _LANE)
    g_pad = _round_up(g, _LANE)
    # never pad M past the actual frame count (the sharded scan path calls
    # this with a handful of frames per block — padding to the VMEM-derived
    # tile would multiply the MXU + transcendental work ~100x)
    tb = min(_pick_tb(f_pad, g_pad), _round_up(m, _SUBLANE))
    m_pad = _round_up(m, tb)

    def prep(x):
        return jnp.pad(x, ((0, 0), (0, m_pad - m), (0, f_pad - f)))

    tau_pad = jnp.pad(jnp.asarray(tau, jnp.float32),
                      ((0, 0), (0, g_pad - g)))
    if valid is None:
        valid = jnp.ones((p,), jnp.int32)
    ptab = jnp.concatenate(
        [jnp.asarray(pairs, jnp.int32),
         jnp.asarray(valid, jnp.int32)[:, None]], axis=1)  # [P, 3]
    om_pad = np.zeros((_SUBLANE, f_pad), np.float32)       # 8 rows: min tile
    om_pad[0, :f] = omega
    # rFFT bin frequencies are a linear ramp f*domega — detected here to
    # enable the kernel's factorised phasor synthesis (direct cos/sin row
    # fallback otherwise, or with MCAX_SRP_FUSED_PHASOR=0 for A/B runs)
    om64 = np.asarray(omega, np.float64)
    domega = None
    if (om64.size > 1 and f_pad % _PHASOR_SUB == 0
            and os.environ.get("MCAX_SRP_FUSED_PHASOR", "1") == "1"):
        d = float(om64[1] - om64[0])
        if np.allclose(om64, d * np.arange(om64.size),
                       rtol=1e-9, atol=abs(d) * 1e-9):
            domega = d

    # Grid: PAIR outer, M-tile inner (r4) — the pair's steering tile is
    # synthesised once into VMEM scratch and reused across every M-tile;
    # the output tiles are revisited per pair and accumulate in place
    # (an [m, g] re-fetch per pair, far cheaper than re-synthesising the
    # [f_pad, g_pad] steering expansion per (M-tile, pair)).
    bf16 = _use_bf16()
    steer_dtype = jnp.bfloat16 if bf16 else jnp.float32
    spec_a = pl.BlockSpec((1, tb, f_pad), lambda k, i, ps: (ps[k, 0], i, 0),
                          memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec((1, tb, f_pad), lambda k, i, ps: (ps[k, 1], i, 0),
                          memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                             # pairs -> SMEM
        grid=(p, m_pad // tb),
        in_specs=[
            spec_a, spec_a,                                # re/im of chan a
            spec_b, spec_b,                                # re/im of chan b
            pl.BlockSpec((p, g_pad), lambda k, i, ps: (0, 0),
                         memory_space=pltpu.VMEM),         # full tau table
            pl.BlockSpec((_SUBLANE, f_pad), lambda k, i, ps: (0, 0),
                         memory_space=pltpu.VMEM),         # omega row
        ],
        out_specs=pl.BlockSpec((tb, g_pad), lambda k, i, ps: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((f_pad, g_pad), steer_dtype),
                        pltpu.VMEM((f_pad, g_pad), steer_dtype)],
    )
    sr, si = prep(st_re), prep(st_im)
    out = pl.pallas_call(
        functools.partial(_fused_kernel, float(eps), bf16, domega),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, g_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * m_pad * p * f_pad * g_pad,
            bytes_accessed=4 * (4 * m_pad * f_pad * p + m_pad * g_pad * p),
            transcendentals=2 * p * g_pad * (
                f_pad // _PHASOR_SUB + _PHASOR_SUB if domega is not None
                else f_pad),
        ),
        interpret=dispatch.interpret_mode(),
    )(ptab, sr, si, sr, si, tau_pad, jnp.asarray(om_pad))
    return out[:m, :g]
