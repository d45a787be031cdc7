"""Fused per-block covariance-prefix kernel (C8 native tier).

The batched throughput mode needs per-block prefix covariances
``covs[b] = lam^T covs[b-1] + sum_t w_t x[b,t] x[b,t]^H`` (covariance.py
``block_prefixes``).  As an einsum, XLA lowers the complex outer-product
contraction (``btfc,btfd->bfcd``) to a Karatsuba triple of tiny-K
"convolution" dots plus SIX full layout copies of the [B, T, F, C]
operands — measured 4.8 ms standalone at the config-4 batched shape
(B=64, T=24, F=513, C=8) where the arithmetic is worth ~25 us: the op is
pure layout/HBM churn, ~45% of the whole on-device dispatch (profiled
round 3, PERF.md).

This kernel reads the spectra ONCE in their native channel-major layout
and keeps everything else in VMEM: grid (F-tiles, B) with B innermost,
the running prefix lives in a [2C^2, f_tile] scratch accumulator
(re/im planes as rows, F down the lanes — the natural TPU layout for a
tiny-C Hermitian bundle), the frame weights are synthesised from an iota,
and each step does the C^2 weighted outer products as C sublane-broadcast
multiply-reduces on the VPU.  HBM traffic: x in, prefixes out — no
operand copies, no Karatsuba intermediates.

Reference analogue: the recursive per-frame covariance update inside an
MVDR beamformer (SURVEY.md §3.4) — the reference updates one [C, C]
matrix per frame in place; the TPU-native form computes all B block
prefixes in one pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcax.kernels import dispatch

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(c: int, t: int, nb: int, lam: float, f_true: int, xr_ref,
            xi_ref, cov0_ref, out_ref, acc_ref):
    ft = pl.program_id(0)
    bb = pl.program_id(1)

    @pl.when(bb == 0)
    def _seed():
        acc_ref[...] = cov0_ref[...]

    # nb blocks per grid step (r5): the per-block [C, 1, T, 128] fetches
    # were ~100 KB DMAs over a 2560-step grid — batching nb of them per
    # step quarters the DMA count at the same traffic; the prefix
    # recursion just unrolls nb times against the same VMEM accumulator.
    acc = acc_ref[...]
    for j in range(nb):
        xr = xr_ref[:, j]                                 # [C, T, ft]
        xi = xi_ref[:, j]
        # spectra are consumed UNPADDED (r5): bins >= f_true are the
        # edge block's masked-load region (unspecified values).  A
        # select pins them to zero so the output's pad bins stay EXACTLY
        # zero — the rows-path MVDR solve relies on zero covariance +
        # pivot floors for pad-bin finiteness.
        fmask = (jax.lax.broadcasted_iota(jnp.int32, xr.shape, 2)
                 + ft * np.int32(_LANE)) < np.int32(f_true)
        xr = jnp.where(fmask, xr, 0.0)
        xi = jnp.where(fmask, xi, 0.0)
        # w_t = (1-lam) * lam^{T-1-t}, synthesised on-chip (lam > 0)
        k = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0).astype(
            jnp.float32)
        w = (np.float32(1.0 - lam)
             * jnp.exp(np.float32(np.log(lam)) * (np.float32(t - 1) - k)))
        xwr = xr * w                                      # [C, T, ft]
        xwi = xi * w
        rows = []
        for ci in range(c):                               # R[c,d] rows
            rows.append(jnp.sum(xwr[ci][None] * xr + xwi[ci][None] * xi,
                                axis=1))                  # [C, ft] re
        for ci in range(c):
            rows.append(jnp.sum(xwi[ci][None] * xr - xwr[ci][None] * xi,
                                axis=1))                  # [C, ft] im
        partial = jnp.concatenate(rows, axis=0)           # [2C^2, ft]
        acc = np.float32(lam ** t) * acc + partial
        out_ref[j] = acc
    acc_ref[...] = acc


def rows_to_complex(out: jnp.ndarray, f: int) -> jnp.ndarray:
    """[B, 2C^2, F_pad] float rows -> complex [B, F, C, C]."""
    b, rows, _ = out.shape
    c = int(np.sqrt(rows // 2))
    re = out[:, :c * c, :f].reshape(b, c, c, f)
    im = out[:, c * c:, :f].reshape(b, c, c, f)
    return jax.lax.complex(jnp.moveaxis(re, -1, 1), jnp.moveaxis(im, -1, 1))


def block_prefixes_rows(spectra: jnp.ndarray, cov0, forget: float,
                        frames_per_block: int):
    """The fused kernel's NATIVE output: ([B, 2C^2, F_pad] float32 rows,
    F).  Row i*C+j is Re R[i,j], C^2+i*C+j is Im R[i,j]; bins past F are
    zero.  The fused MVDR solve (mvdrsolve.weights_blocks_fused_rows)
    consumes this directly, skipping the complex [B, F, C, C] round trip
    (two full-tensor layout transposes at the batched shapes — the ops
    around the kernels in the r4 profile)."""
    if not 0.0 < forget <= 1.0:
        # The on-chip weight synthesis uses exp(log(lam)·k); lam=0 would
        # yield log(0)·0 = NaN where the direct lam**k form gives 1.
        raise ValueError(f"forget must be in (0, 1], got {forget}")
    c, m, f = spectra.shape
    t = frames_per_block
    b = m // t
    f_pad = _round_up(f, _LANE)
    rows = 2 * c * c

    # inputs stay UNPADDED: the reshape is a view, Pallas masks the edge
    # F block and the kernel zero-selects the masked bins (the former
    # jnp.pad to F_pad materialised two full [C, B, T, F_pad] copies —
    # ~1.6 ms/dispatch of the batch-512 config-4 profile)
    xr = jnp.real(spectra).reshape(c, b, t, f)
    xi = jnp.imag(spectra).reshape(c, b, t, f)
    if cov0 is None:
        cov0_rows = jnp.zeros((rows, f_pad), jnp.float32)
    else:                                                 # [F, C, C] complex
        cr = jnp.moveaxis(jnp.real(cov0), 0, -1).reshape(c * c, f)
        ci = jnp.moveaxis(jnp.imag(cov0), 0, -1).reshape(c * c, f)
        cov0_rows = jnp.pad(jnp.concatenate([cr, ci], axis=0),
                            ((0, 0), (0, f_pad - f)))

    nb = next(k for k in (8, 4, 2, 1) if b % k == 0)
    grid = (f_pad // _LANE, b // nb)
    out = pl.pallas_call(
        functools.partial(_kernel, c, t, nb, float(forget), f),
        grid=grid,
        in_specs=[
            pl.BlockSpec((c, nb, t, _LANE), lambda ft, bb: (0, bb, 0, ft),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, nb, t, _LANE), lambda ft, bb: (0, bb, 0, ft),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, _LANE), lambda ft, bb: (0, ft),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, rows, _LANE), lambda ft, bb: (bb, 0, ft),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rows, f_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rows, _LANE), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * c * c * t * f_pad,
            bytes_accessed=4 * (2 * c * m * f_pad + b * rows * f_pad),
            transcendentals=grid[0] * b * t,
        ),
        interpret=dispatch.interpret_mode(),
    )(xr, xi, cov0_rows)
    return out, f


def block_prefixes_fused(spectra: jnp.ndarray, cov0, forget: float,
                         frames_per_block: int) -> jnp.ndarray:
    """Drop-in fused path for covariance.block_prefixes (same contract:
    complex spectra [C, M, F] -> complex prefix covariances [B, F, C, C]).
    Matches the einsum path to fp32 tolerance (t-summation order differs)."""
    out, f = block_prefixes_rows(spectra, cov0, forget, frames_per_block)
    return rows_to_complex(out, f)
