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
  4. accumulates  Re(G . E)  with MXU matmuls (bf16x3 hi/lo-split passes
     by default — see _dot_tier) into a VMEM-RESIDENT [M, G]
     accumulator: the output BlockSpec's index map is constant, so the
     whole output block stays in VMEM for the entire grid and is written
     back to HBM exactly once.  (The r4 version instead revisited
     [tb, G] output blocks non-consecutively across the outer pair loop
     and did ``out_ref[...] +=`` on them — Pallas TPU does not guarantee
     a revisited output block is re-fetched, so at m > tb the
     accumulator could contain a *different tile's* data; the
     TPU-faithful interpreter rejects that pattern outright.  The
     resident accumulator is both correct and cheaper: one [M, G] write
     instead of one per pair.  M is chunked in the wrapper when the
     accumulator would not fit VMEM.)

HBM traffic: spectra slices (2 channels x 2 planes per pair) + the [M, G]
output ONCE — no CPS tensor, no steering matrices.  Reference analogue:
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


def _dot_tier() -> str:
    """MXU precision tier for the steering matmuls: ``x1 | x3 | x6``.

    r5 finding: Mosaic's DEFAULT f32 dot is a SINGLE bf16 MXU pass —
    ~1e-3 relative surface error, which r4 shipped unknowingly (and
    partly mis-attributed to cos/sin range reduction).  The honest
    tiers, all fp32-accumulated:

      x1 — one bf16 pass per dot (~1e-3 rel; the r4 de-facto behavior).
      x3 — manual hi/lo bf16 split, 3 passes per dot (~1.5e-5 rel; the
           dropped lo*lo term bounds the error at ~eps_bf16^2).  The
           DEFAULT: indistinguishable from fp32 at the surface's
           peak-choice level and measured within noise of x1 (the
           kernel is traffic/VPU-bound, BENCH_DETAIL r5).
      x6 — Precision.HIGHEST (6 passes, full fp32, ~1e-7): the --verify
           reference tier; measured ~1.7x slower standalone (2.54 vs
           1.52 ms at the batched config-4 shape).

    Knob: MCAX_SRP_FUSED_DOT=x1|x3|x6 (legacy MCAX_SRP_FUSED_BF16=1
    aliases x1)."""
    if os.environ.get("MCAX_SRP_FUSED_BF16", "0") == "1":
        return "x1"
    t = os.environ.get("MCAX_SRP_FUSED_DOT", "x3").lower()
    if t not in ("x1", "x3", "x6"):
        raise ValueError(f"MCAX_SRP_FUSED_DOT must be x1|x3|x6, got {t!r}")
    return t


def _hi_lo(x):
    """Split f32 into bf16 hi + bf16 lo with x ~ hi + lo (err ~eps^2)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _plan_tiles(m: int, f_pad: int, g_pad: int,
                vmem_budget=15_300_000) -> tuple[int, int]:
    """(tb, m_chunk): M-rows per tile and rows per pallas_call.

    Resident for the whole call: the [m_chunk, g_pad] output accumulator
    (constant output index map, single-buffered) and the synthesised
    steering scratch + its expansion temporaries.  Per step: 4 spectra
    slices [tb, f_pad] (double-buffered) + CPS/mask temporaries.  The
    steering synthesis runs once per (chunk, pair) regardless of tb
    (r5), so tb only sets the spectra-fetch granularity / dot shape;
    m_chunk is maximised within budget so acceptance shapes run in few
    chunks.

    The usage model is EMPIRICAL, calibrated against Mosaic's scoped-
    vmem allocator on v5e (r5: compile probes at the batch-512 config-4
    shape; a naive buffer-sum model misses ~4 MB of kernel stack
    temporaries):
      bytes ~ 13*f_pad*4 * tb  +  g_pad*4 * m_chunk  +  5*f_pad*g_pad
    The 5*f_pad*g_pad constant holds AFTER the _SYNTH_SPLIT slab
    synthesis (it was ~26*f_pad*g_pad with whole-F expansion temps).
    Verified against measured allocator sizes: (256, 4608) -> model
    16.90 MB = measured 16.90 (reject), (192, 6144) -> 17.02 vs 17.10
    (reject), (192, 4608) / (256, 3072) compile."""
    tb_env = os.environ.get("MCAX_SRP_FUSED_TB")

    def usage(tb, m_chunk):
        per_tb = 13 * f_pad * 4     # 2x4 double-buffered slices + stack
        # steering scratch + slab temps; the measured constant varies
        # ~1.3 MB between embedding programs (same plan probed 1.27 vs
        # 2.52 MB const in two jits), so this carries the WORST observed
        const = 11 * f_pad * g_pad
        return tb * per_tb + m_chunk * g_pad * 4 + const

    tb = 192 if tb_env is None else max(_SUBLANE, int(tb_env))
    # never tile M past the actual frame count (the sharded scan path
    # calls this with a handful of frames per block — padding to a big
    # tile would multiply the MXU + transcendental work ~100x)
    tb = min(tb, _round_up(m, _SUBLANE))
    m_chunk = _round_up(m, tb)
    while m_chunk > tb and usage(tb, m_chunk) > vmem_budget:
        m_chunk -= tb
    while tb > _SUBLANE and usage(tb, m_chunk) > vmem_budget:
        tb = max(_SUBLANE, tb // 2)
        m_chunk = min(m_chunk - m_chunk % tb, _round_up(m, tb))
    return max(tb, _SUBLANE), max(m_chunk, tb)


_PHASOR_SUB = 16    # twiddle split: f = a*_PHASOR_SUB + b
_SYNTH_SPLIT = 4    # steering synthesis F-slabs (VMEM temp reduction)

# fp32 two-constant split of 2*pi for the in-kernel range reduction:
# ang - k*(2pi) computed as (ang - k*HI) - k*LO keeps the reduction error
# at the ~ulp level instead of k*ulp(2pi).
_TWO_PI_HI = np.float32(2.0 * np.pi)
_TWO_PI_LO = np.float32(2.0 * np.pi - np.float64(_TWO_PI_HI))


def _reduce_angle(ang):
    """Range-reduce phases into ~[-pi, pi] before cos/sin.

    Mosaic's fast cos/sin loses ~1e-3 of relative accuracy once |phase|
    reaches ~20 rad (measured r4, TPU_VERIFY_r04), and the steering phase
    omega_f * tau grows with aperture x sample rate — so without this the
    kernel's on-chip error was input-dependent (VERDICT r4 weak 5).  One
    round + two fused mul-subs per element, on the tiny [na+16, G] phasor
    factors only."""
    k = jnp.round(ang * np.float32(1.0 / (2.0 * np.pi)))
    return (ang - k * _TWO_PI_HI) - k * _TWO_PI_LO


def _fused_kernel(eps: float, tier: str, domega, f_true: int,
                  pairs_ref, ar_ref, ai_ref, br_ref, bi_ref,
                  tau_ref, om_ref, out_ref, *steer_refs):
    k = pl.program_id(0)                                   # pair (outer)
    i = pl.program_id(1)                                   # M-tile (inner)

    @pl.when(i == 0)
    def _steer():
        # Steering tile for this pair, synthesised on-chip ONCE per
        # (chunk, pair) and kept in VMEM scratch across all M-tiles (r4:
        # with the old M-outer grid this expansion re-ran per
        # (M-tile, pair) and — together with the spectra re-reads — was
        # the kernel's real bottleneck; an fp32->bf16 matmul A/B moved
        # the total by only 2%).
        # E[f, g] = e^{+j omega_f tau_k[g]}  (sign matches steer.py)
        # Synthesised in _SYNTH_SPLIT F-slabs so the expansion's f32
        # temporaries cover f_pad/_SYNTH_SPLIT rows at a time — the
        # constant-VMEM term this shaves (~2 MB at config-4 shapes) buys
        # a 2x larger m_chunk, i.e. half the chunk calls and half the
        # per-chunk synthesis cost (r5; ~0.74 ms fixed per chunk call
        # measured at the batched config-4 shape).
        tau_row = tau_ref[k, :]                            # [g_pad]
        fp = steer_refs[0].shape[0]
        gp = tau_row.shape[-1]
        nslab = fp // _SYNTH_SPLIT if fp % _SYNTH_SPLIT == 0 else fp
        for s0 in range(0, fp, nslab):
            if domega is not None:
                # Two-level phasor factorisation: omega_f = f*domega and
                # f = a*16 + b: E[f] = A[a]*B[b], A = e^{j*16a*domega*tau},
                # B = e^{j*b*domega*tau} — (fp/16 + 16) rows of cos/sin
                # instead of fp rows (~11x fewer transcendentals), then
                # one unit-phasor complex multiply per element (~1 ulp
                # phase error).  The omega ramp continues past F into the
                # pad rows, which multiply zeroed CPS — values moot.
                na = nslab // _PHASOR_SUB
                a0 = s0 // _PHASOR_SUB
                ang_a = ((jax.lax.broadcasted_iota(jnp.float32, (na, 1), 0)
                          + np.float32(a0))
                         * np.float32(_PHASOR_SUB * domega)
                         * tau_row[None, :])
                ang_b = (jax.lax.broadcasted_iota(jnp.float32,
                                                  (_PHASOR_SUB, 1), 0)
                         * np.float32(domega)) * tau_row[None, :]
                ang_a = _reduce_angle(ang_a)
                ang_b = _reduce_angle(ang_b)
                ca, sa = jnp.cos(ang_a), jnp.sin(ang_a)    # [na, gp]
                cb, sb = jnp.cos(ang_b), jnp.sin(ang_b)    # [16, gp]
                er = (ca[:, None, :] * cb[None, :, :]
                      - sa[:, None, :] * sb[None, :, :]).reshape(nslab, gp)
                ei = (sa[:, None, :] * cb[None, :, :]
                      + ca[:, None, :] * sb[None, :, :]).reshape(nslab, gp)
            else:
                ang = (om_ref[0, pl.ds(s0, nslab)][:, None]
                       * tau_row[None, :])                 # [nslab, g_pad]
                ang = _reduce_angle(ang)
                er = jnp.cos(ang)
                ei = jnp.sin(ang)
            sl = pl.ds(s0, nslab)
            if tier == "x3":
                er_h, er_l, ei_h, ei_l = steer_refs
                er_h[sl, :], er_l[sl, :] = _hi_lo(er)
                ei_h[sl, :], ei_l[sl, :] = _hi_lo(ei)
            else:
                er_ref, ei_ref = steer_refs
                er_ref[sl, :] = er.astype(er_ref.dtype)
                ei_ref[sl, :] = ei.astype(ei_ref.dtype)

    tb = ar_ref.shape[1]

    @pl.when(jnp.logical_and(k == 0, i == 0))
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
    # spectra are consumed UNPADDED: bins >= f_true are the edge block's
    # masked-load region (unspecified values) — a select (not a multiply:
    # NaN*0 = NaN) pins their CPS contribution to zero
    fmask = (jax.lax.broadcasted_iota(jnp.int32, gr.shape, 1)
             < np.int32(f_true))
    gr = jnp.where(fmask, gr * w, 0.0)
    gi = jnp.where(fmask, gi * w, 0.0)

    def dot(a, b, prec=jax.lax.Precision.DEFAULT):
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=prec)

    if tier == "x3":
        # (ah+al)(bh+bl) ~ ah.bh + ah.bl + al.bh — the dropped lo*lo term
        # bounds the error at ~eps_bf16^2 ~ 1.5e-5; steering was split
        # once per pair at synthesis, the CPS is split here per tile.
        er_h, er_l, ei_h, ei_l = steer_refs
        gr_h, gr_l = _hi_lo(gr)
        gi_h, gi_l = _hi_lo(gi)
        acc = (dot(gr_h, er_h[...]) + dot(gr_h, er_l[...])
               + dot(gr_l, er_h[...])
               - dot(gi_h, ei_h[...]) - dot(gi_h, ei_l[...])
               - dot(gi_l, ei_h[...]))
    else:
        er_ref, ei_ref = steer_refs
        if tier == "x1":
            gr, gi = gr.astype(jnp.bfloat16), gi.astype(jnp.bfloat16)
        # x6: Mosaic's DEFAULT f32 dot is one bf16 MXU pass (~1e-3 rel
        # err — the r5 finding behind the tier split, see _dot_tier);
        # HIGHEST requests the full 6-pass fp32-accurate form.
        prec = (jax.lax.Precision.HIGHEST if tier == "x6"
                else jax.lax.Precision.DEFAULT)
        acc = dot(gr, er_ref[...], prec) - dot(gi, ei_ref[...], prec)
    # The output block's index map is CONSTANT, so out_ref is one
    # VMEM-resident [m_chunk, g_pad] accumulator for the whole grid —
    # the += below never depends on a revisited block being re-fetched
    # (the r4 hazard), and HBM sees a single writeback at the end.
    row = pl.multiple_of(i * tb, tb)
    out_ref[pl.ds(row, tb), :] += acc


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
    tb, m_chunk = _plan_tiles(m, f_pad, g_pad)
    n_chunks = -(-m // m_chunk)
    n_tiles = m_chunk // tb

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

    # One pallas_call per M-chunk, grid (pair, M-tile) with pair OUTER:
    # the pair's steering tile is synthesised once per (chunk, pair) into
    # VMEM scratch and reused across the chunk's M-tiles.  The output is
    # the call's whole [m_chunk, g_pad] block with a CONSTANT index map —
    # one single-buffered VMEM-resident accumulator (accumulation never
    # touches a revisited block, the r4 hazard).  Spectra are consumed
    # UNPADDED and UNSLICED (r5): every chunk call reads the same full
    # [C, M, F] planes with an M-offset folded into the BlockSpec index
    # map, Pallas masks the edge blocks, and pad bins are killed
    # in-kernel via the PHAT-weight mask — the former jnp.pad to
    # [C, M_pad, F_pad] plus per-chunk slice copies (~0.5 GB/dispatch of
    # pure copy at the batch-512 config-4 shape) are gone.
    tier = _dot_tier()
    if tier == "x3":
        # hi/lo bf16 steering planes: 4 buffers x 2 B = same VMEM as 2 f32
        scratch = [pltpu.VMEM((f_pad, g_pad), jnp.bfloat16)
                   for _ in range(4)]
    else:
        steer_dtype = jnp.bfloat16 if tier == "x1" else jnp.float32
        scratch = [pltpu.VMEM((f_pad, g_pad), steer_dtype)
                   for _ in range(2)]
    om_dev = jnp.asarray(om_pad)
    chunks = []
    for cnk in range(n_chunks):
        base = cnk * n_tiles            # M block offset, in units of tb
        mc = min(m_chunk, m - cnk * m_chunk)
        spec_a = pl.BlockSpec(
            (1, tb, f_pad),
            lambda k, i, ps, base=base: (ps[k, 0], base + i, 0),
            memory_space=pltpu.VMEM)
        spec_b = pl.BlockSpec(
            (1, tb, f_pad),
            lambda k, i, ps, base=base: (ps[k, 1], base + i, 0),
            memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,                         # pairs -> SMEM
            grid=(p, -(-mc // tb)),
            in_specs=[
                spec_a, spec_a,                            # re/im of chan a
                spec_b, spec_b,                            # re/im of chan b
                pl.BlockSpec((p, g_pad), lambda k, i, ps: (0, 0),
                             memory_space=pltpu.VMEM),     # full tau table
                pl.BlockSpec((_SUBLANE, f_pad), lambda k, i, ps: (0, 0),
                             memory_space=pltpu.VMEM),     # omega row
            ],
            # constant index map: ONE single-buffered VMEM-resident
            # accumulator per call (a chunk-indexed map would be double-
            # buffered by the pipeline — measured 20 MB > the 16 MB VMEM
            # at the batch-512 shape)
            out_specs=pl.BlockSpec((m_chunk, g_pad),
                                   lambda k, i, ps: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=list(scratch),
        )
        chunks.append(pl.pallas_call(
            functools.partial(_fused_kernel, float(eps), tier, domega, f),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((mc, g), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=4 * mc * p * f_pad * g_pad,
                bytes_accessed=4 * (4 * mc * f * p + mc * g),
                transcendentals=2 * p * g_pad * (
                    f_pad // _PHASOR_SUB + _PHASOR_SUB if domega is not None
                    else f_pad),
            ),
            interpret=dispatch.interpret_mode(),
        )(ptab, st_re, st_im, st_re, st_im, tau_pad, om_dev))
    return chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=0)
