"""Fused framing + windowing + forward-DFT kernel (C2+C3, one pass).

The batched pipeline's analysis chain materialised three full-size
intermediates per dispatch (batch-512 config-4 profile, r5): a layout
copy of the [C, S, hop] slab tensor (~0.6 ms), a two-output fusion
building both shifted frame halves [C, T, hop] x 2 (~1.2 ms), and the
two forward-DFT matmul fusions each re-reading both halves (~4.1 ms) —
~5.9 ms total, most of it HBM traffic for tensors that exist only to be
contracted away.

This kernel reads the slab tensor ONCE and emits spectra planes
directly.  For the ratio-2 overlap every shipped config uses
(frame_len = 2*hop), frame t is slabs t and t+1, so with the windowed
DFT matrix split into halves W = [W_top; W_bot]:

    X[t] = slab_t @ W_top + slab_{t+1} @ W_bot

Grid (C', T-tiles); per step the kernel fetches the tile's tb slabs
plus ONE boundary row (slab (i+1)*tb, via a second 8-slab BlockSpec on
the same array — BlockSpec index maps cannot express overlapping
blocks, but a narrower block with a coarser index CAN address the tile
boundary), shifts rows in VMEM to build the hi half, and accumulates
the four (or twelve, at bf16x3) MXU dots into the re/im output tiles.
The DFT matrices ride in as constant-indexed inputs, pre-split hi/lo on
the host for the x3 tier; the analysis window is folded into them
(kernels/fft._fwd_matrices).  Spectra/outputs are consumed/produced
UNPADDED — Pallas masks the edge blocks (garbage columns fall in the
masked write region and are dropped).

Precision follows MCAX_FFT_PRECISION (kernels/fft._prec): highest =
fp32 HIGHEST dots, high (TPU default) = manual hi/lo bf16x3 (~99 dB,
same tier the XLA matmul path uses), default = one bf16 pass.

Reference analogue: dspone ShortTimeProcess frameAnalysis + wipp_fft
per frame (SURVEY.md §3.1 hot loop) — collapsed into one MXU pass over
all frames of a dispatch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcax.kernels import dispatch
from mcax.kernels import fft as kfft

_LANE = 128
_SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _hi_lo_np(w: np.ndarray):
    hi = w.astype(np.float32).astype(jnp.bfloat16)
    lo = (w.astype(np.float32) - np.asarray(hi, np.float32)).astype(
        jnp.bfloat16)
    return np.asarray(hi), np.asarray(lo)


@functools.lru_cache(maxsize=None)
def _split_matrices(n: int, f: int, win_key: str):
    """Host-side windowed DFT matrix halves for frame_len n = 2*hop.

    Returns (tier-independent) dict of numpy arrays:
      f32: wr_top, wr_bot, wi_top, wi_bot           [hop, F]
      bf16 hi/lo splits of each for the x3 tier     [hop, F] x 8
    """
    wr, wi = kfft._fwd_matrices(n, f, win_key)     # [N, F] f32, exact cols
    h = n // 2
    out = {"wr_top": wr[:h], "wr_bot": wr[h:],
           "wi_top": wi[:h], "wi_bot": wi[h:]}
    for name in list(out):
        hi, lo = _hi_lo_np(out[name])
        out[name + "_h"] = hi
        out[name + "_l"] = lo
    return out


def _tier() -> str:
    p = kfft._prec()
    if p == jax.lax.Precision.HIGHEST:
        return "x6"
    if p == jax.lax.Precision.HIGH:
        return "x3"
    return "x1"


def _kernel(tier: str, slab_ref, bnd_ref, *rest):
    if tier == "x3":
        w_refs, (re_ref, im_ref) = rest[:8], rest[8:]
    else:
        w_refs, (re_ref, im_ref) = rest[:4], rest[4:]
    lo = slab_ref[0]                                      # [tb, hop]
    # hi half: rows shifted by one slab; the tile's last frame takes the
    # boundary block's first row (slab (i+1)*tb)
    hi = jnp.concatenate([lo[1:], bnd_ref[0, :1]], axis=0)

    def dot(a, b, prec=jax.lax.Precision.DEFAULT):
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=prec)

    if tier == "x3":
        (wrt_h, wrt_l, wrb_h, wrb_l,
         wit_h, wit_l, wib_h, wib_l) = (r[...] for r in w_refs)
        lo_h = lo.astype(jnp.bfloat16)
        lo_l = (lo - lo_h.astype(jnp.float32)).astype(jnp.bfloat16)
        hi_h = hi.astype(jnp.bfloat16)
        hi_l = (hi - hi_h.astype(jnp.float32)).astype(jnp.bfloat16)
        re_ref[0] = (dot(lo_h, wrt_h) + dot(lo_h, wrt_l) + dot(lo_l, wrt_h)
                     + dot(hi_h, wrb_h) + dot(hi_h, wrb_l)
                     + dot(hi_l, wrb_h))
        im_ref[0] = (dot(lo_h, wit_h) + dot(lo_h, wit_l) + dot(lo_l, wit_h)
                     + dot(hi_h, wib_h) + dot(hi_h, wib_l)
                     + dot(hi_l, wib_h))
    else:
        wrt, wrb, wit, wib = (r[...] for r in w_refs)
        prec = (jax.lax.Precision.HIGHEST if tier == "x6"
                else jax.lax.Precision.DEFAULT)
        if tier == "x1":
            lo = lo.astype(jnp.bfloat16)
            hi = hi.astype(jnp.bfloat16)
        re_ref[0] = dot(lo, wrt, prec) + dot(hi, wrb, prec)
        im_ref[0] = dot(lo, wit, prec) + dot(hi, wib, prec)


def _pick_tb(hop: int, f_pad: int, t: int) -> int:
    """tb rows per tile.  VMEM: W operands (4 f32 or 8 bf16 [hop, f_pad]
    = 4*hop*f_pad bytes either way, constant-indexed), slab blocks
    (double-buffered) + boundary, two output blocks (double-buffered),
    and the hi-shift/split temporaries.  Conservative budget — the W
    residency may be double-counted by the allocator."""
    budget = 13 * 2 ** 20
    w_bytes = 2 * 4 * hop * f_pad                  # worst case: 2x alloc

    def usage(tb_):
        slabs = 2 * tb_ * hop * 4
        outs = 2 * 2 * tb_ * f_pad * 4
        temps = 8 * tb_ * max(hop, f_pad) * 4
        return w_bytes + slabs + outs + temps

    tb = min(256, _round_up(t, _SUBLANE))
    while tb > _SUBLANE and usage(tb) > budget:
        tb = max(_SUBLANE, tb // 2)
    return tb


def stft_fused_planes(x: jnp.ndarray, window: np.ndarray, hop: int):
    """[..., N] real -> (re, im) float32 [..., T, F] for frame = 2*hop.

    The caller guarantees frame_len == 2*hop == len(window) and
    N % hop == 0 (every shipped config's block/carry layout).
    """
    n = int(window.shape[0])
    assert n == 2 * hop
    f = n // 2 + 1
    lead = x.shape[:-1]
    cc = int(np.prod(lead)) if lead else 1
    nslab = x.shape[-1] // hop
    t = nslab - 1
    slabs = x.reshape(cc, nslab, hop)
    f_pad = _round_up(f, _LANE)
    tb = _pick_tb(hop, f_pad, t)
    n_tiles = -(-t // tb)
    tier = _tier()
    win_key = kfft._register_window(window)
    mats = _split_matrices(n, f, win_key)
    if tier == "x3":
        w_names = ("wr_top_h", "wr_top_l", "wr_bot_h", "wr_bot_l",
                   "wi_top_h", "wi_top_l", "wi_bot_h", "wi_bot_l")
    else:
        w_names = ("wr_top", "wr_bot", "wi_top", "wi_bot")
    w_arrays = [mats[name] for name in w_names]
    w_specs = [pl.BlockSpec((hop, f_pad), lambda c, i: (0, 0),
                            memory_space=pltpu.VMEM)
               for _ in w_arrays]

    # boundary block index, clamped so the block is never fully OOB (the
    # clamped case only arises for the last tile, whose boundary row is
    # then unused — its frames come entirely from the lo block)
    last_bnd = max(0, (nslab - 1) // _SUBLANE)
    re, im = pl.pallas_call(
        functools.partial(_kernel, tier),
        grid=(cc, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tb, hop), lambda c, i: (c, i, 0),
                         memory_space=pltpu.VMEM),       # tile slabs
            # boundary: slab (i+1)*tb via a coarser-narrower block on the
            # same array (tb % 8 == 0 so the element offset is exact)
            pl.BlockSpec((1, _SUBLANE, hop),
                         lambda c, i: (c, jnp.minimum(
                             (i + 1) * (tb // _SUBLANE), last_bnd), 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=[
            pl.BlockSpec((1, tb, f_pad), lambda c, i: (c, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, f_pad), lambda c, i: (c, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((cc, t, f), jnp.float32),
                   jax.ShapeDtypeStruct((cc, t, f), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * cc * t * n * f,
            bytes_accessed=4 * (cc * nslab * hop + 2 * cc * t * f),
            transcendentals=0,
        ),
        interpret=dispatch.interpret_mode(),
    )(slabs, slabs, *w_arrays)
    return re.reshape(*lead, t, f), im.reshape(*lead, t, f)


def stft_fused_from_blocks(samples: jnp.ndarray, carry: jnp.ndarray,
                           window: np.ndarray, hop: int):
    """Spectra planes straight from the BATCHED input layout.

    The batched pipeline's assembly previously transposed [B, C, L] to
    [C, B*L], concatenated the carry, and let XLA materialise a slab
    layout copy — ~1.2 ms/dispatch of pure data movement at the
    batch-512 config-4 shape (pad_maximum_fusion + copy in the r5
    profile).  This variant reads the [B, C, T', hop] RESHAPE-VIEW of
    the input directly: grid (C, B-tiles); per step the kernel fetches a
    [nb, 1, T', hop] box (nb input blocks of one channel — a valid
    memory box, unlike a cross-block slab run in channel-major order),
    the previous box's last slab via a second BlockSpec, and the
    streaming carry for the very first frame.  Frame t's hi slab is
    samples slab t and its lo slab is samples slab t-1 (carry at t=0),
    so ``lo = [prev; box[:-1]], hi = box``.

    Args:
      samples: [B, C, L] float32 with L % hop == 0.
      carry: [C, frame-hop] float32 (the previous dispatch's tail);
        frame = 2*hop so this is [C, hop].
      window: [2*hop] analysis window (host constant).
      hop: frame advance.
    Returns:
      (re, im [C, B*T', F], new_carry [C, hop]).
    """
    n = int(window.shape[0])
    assert n == 2 * hop
    f = n // 2 + 1
    bb, c, block_len = samples.shape
    tprime = block_len // hop
    m = bb * tprime
    f_pad = _round_up(f, _LANE)
    tier = _tier()
    win_key = kfft._register_window(window)
    mats = _split_matrices(n, f, win_key)
    if tier == "x3":
        w_names = ("wr_top_h", "wr_top_l", "wr_bot_h", "wr_bot_l",
                   "wi_top_h", "wi_top_l", "wi_bot_h", "wi_bot_l")
    else:
        w_names = ("wr_top", "wr_bot", "wi_top", "wi_bot")
    w_arrays = [mats[name] for name in w_names]
    w_specs = [pl.BlockSpec((hop, f_pad), lambda ci, i: (0, 0),
                            memory_space=pltpu.VMEM)
               for _ in w_arrays]
    # blocks per tile: target ~384 frame rows per dot — measured r5:
    # 384 beats 256 by ~1.5% end-to-end (fewer boundary fetches + split
    # temps per row); 768 exceeds the 16 MB VMEM (the W operands alone
    # hold ~5.2 MB and the double-buffered out blocks scale with rows)
    nb = max(1, min(bb, 384 // tprime))
    n_tiles = -(-bb // nb)
    slabs = samples.reshape(bb, c, tprime, hop)
    tp8 = tprime // _SUBLANE if tprime % _SUBLANE == 0 else None
    assert tp8 is not None, "frames_per_block must be a multiple of 8"

    def _kern(slab_ref, prev_ref, carry_ref, *rest):
        if tier == "x3":
            w_refs, (re_ref, im_ref) = rest[:8], rest[8:]
        else:
            w_refs, (re_ref, im_ref) = rest[:4], rest[4:]
        ci = pl.program_id(0)
        i = pl.program_id(1)
        rows = slab_ref.shape[0] * slab_ref.shape[2]
        hi = slab_ref[...].reshape(rows, hop)
        prev_tail = prev_ref[0, 0, _SUBLANE - 1:_SUBLANE]  # [1, hop]
        carry_row = carry_ref[pl.ds(ci, 1), :]             # [1, hop]
        first = jnp.where(i == 0, carry_row, prev_tail)
        lo = jnp.concatenate([first, hi[:-1]], axis=0)

        def dot(a, b, prec=jax.lax.Precision.DEFAULT):
            return jnp.dot(a, b, preferred_element_type=jnp.float32,
                           precision=prec)

        if tier == "x3":
            (wrt_h, wrt_l, wrb_h, wrb_l,
             wit_h, wit_l, wib_h, wib_l) = (r[...] for r in w_refs)
            lo_h = lo.astype(jnp.bfloat16)
            lo_l = (lo - lo_h.astype(jnp.float32)).astype(jnp.bfloat16)
            hi_h = hi.astype(jnp.bfloat16)
            hi_l = (hi - hi_h.astype(jnp.float32)).astype(jnp.bfloat16)
            re_ref[0] = (dot(lo_h, wrt_h) + dot(lo_h, wrt_l)
                         + dot(lo_l, wrt_h) + dot(hi_h, wrb_h)
                         + dot(hi_h, wrb_l) + dot(hi_l, wrb_h))
            im_ref[0] = (dot(lo_h, wit_h) + dot(lo_h, wit_l)
                         + dot(lo_l, wit_h) + dot(hi_h, wib_h)
                         + dot(hi_h, wib_l) + dot(hi_l, wib_h))
        else:
            wrt, wrb, wit, wib = (r[...] for r in w_refs)
            prec = (jax.lax.Precision.HIGHEST if tier == "x6"
                    else jax.lax.Precision.DEFAULT)
            if tier == "x1":
                lo = lo.astype(jnp.bfloat16)
                hi = hi.astype(jnp.bfloat16)
            re_ref[0] = dot(lo, wrt, prec) + dot(hi, wrb, prec)
            im_ref[0] = dot(lo, wit, prec) + dot(hi, wib, prec)

    re, im = pl.pallas_call(
        _kern,
        grid=(c, n_tiles),
        in_specs=[
            pl.BlockSpec((nb, 1, tprime, hop),
                         lambda ci, i: (i, ci, 0, 0),
                         memory_space=pltpu.VMEM),        # tile's blocks
            # previous box's LAST slab: an 8-slab block of the PREVIOUS
            # input block's tail (clamped at 0; unused there — the carry
            # covers frame 0)
            pl.BlockSpec((1, 1, _SUBLANE, hop),
                         lambda ci, i: (jnp.maximum(i * nb - 1, 0), ci,
                                        tp8 - 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((carry.shape[0], hop), lambda ci, i: (0, 0),
                         memory_space=pltpu.VMEM),        # streaming carry
                         # (whole [C, hop] resident — a (1, hop) block
                         # would violate Mosaic's sublane-divisibility)
            *w_specs,
        ],
        out_specs=[
            pl.BlockSpec((1, nb * tprime, f_pad),
                         lambda ci, i: (ci, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb * tprime, f_pad),
                         lambda ci, i: (ci, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((c, m, f), jnp.float32),
                   jax.ShapeDtypeStruct((c, m, f), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * m * c * n * f,
            bytes_accessed=4 * (bb * c * block_len + 2 * c * m * f),
            transcendentals=0,
        ),
        interpret=dispatch.interpret_mode(),
    )(slabs, slabs, carry, *w_arrays)
    new_carry = samples[-1, :, -hop:]
    return re, im, new_carry
