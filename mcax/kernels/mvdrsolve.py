"""Fused MVDR weight solve (C9 hot path — native tier).

``w = R^{-1} d / (d^H R^{-1} d)`` per (block, bin).  The XLA path
(mvdr.weights_blocks) unrolls a complex Cholesky + two substitutions as
batch-elementwise ops — numerically right, but every one of the ~8+2C
column sweeps re-streams the full [B·F, C, C] complex residual through
HBM (~1 GB of traffic at config4's batched shape for ~100 MFLOP of
arithmetic).  This kernel does the whole chain — diagonal loading,
Cholesky, forward/adjoint substitution per source, distortionless
normalisation — in ONE pass: covariances are read once as re/im-plane
rows with the (block, bin) pairs flattened onto the lane axis, every
intermediate lives in VMEM/registers, and the unrolled row arithmetic
runs on full [8, 128] VPU tiles.

Reference analogue: the per-frame MVDR solve of SURVEY.md §3.4 (the
reference would call a LAPACK-style dense solve per bin); the TPU-native
form solves all B·F bins as 128-lane vector arithmetic.

Numerics match mvdr.weights_blocks: real pivot with 1e-30 floor, loading
delta·tr(R)/C, denom floored at 1e-12, fp32 throughout (VPU — no MXU, no
bf16 anywhere).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcax.kernels import dispatch

_TILE = 1024                           # lanes per grid step: one [8,128] tile


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _solve_math(c: int, s: int, delta: float, re, im, dget, wset):
    """The shared per-lane-vector solve: diagonal loading + complex
    Cholesky + forward/adjoint substitution per source + distortionless
    normalisation.  ``re(i, j)``/``im(i, j)`` fetch covariance row
    vectors, ``dget(src, k)`` -> (re, im) steering rows,
    ``wset(src, k, re, im)`` stores weight rows."""
    # diagonal loading: R[j,j] += delta * tr(R)/C  (trace is real)
    tr = re(0, 0)
    for j in range(1, c):
        tr = tr + re(j, j)
    load = np.float32(delta / c) * tr

    # complex Cholesky, right-looking, fully unrolled; L kept in registers
    # as (re, im) row pairs; diagonal kept as its reciprocal (real > 0)
    rr = {(i, j): (re(i, j), im(i, j)) for j in range(c)
          for i in range(j, c)}
    for j in range(c):
        rr[(j, j)] = (rr[(j, j)][0] + load, rr[(j, j)][1])
    l = {}
    linv = {}
    for j in range(c):
        piv = jnp.sqrt(jnp.maximum(rr[(j, j)][0], np.float32(1e-30)))
        inv = np.float32(1.0) / piv
        l[(j, j)] = (piv, jnp.zeros_like(piv))
        linv[j] = inv
        for i in range(j + 1, c):
            ar, ai = rr[(i, j)]
            l[(i, j)] = (ar * inv, ai * inv)
        for i in range(j + 1, c):
            for k in range(j + 1, i + 1):
                # R[i,k] -= L[i,j] * conj(L[k,j])
                br, bi = l[(i, j)]
                cr, ci = l[(k, j)]
                pr, pi = rr[(i, k)]
                rr[(i, k)] = (pr - (br * cr + bi * ci),
                              pi - (bi * cr - br * ci))

    for src in range(s):
        d = [dget(src, k) for k in range(c)]
        # forward: L y = d
        y = [None] * c
        for k in range(c):
            ar, ai = d[k]
            for j in range(k):
                br, bi = l[(k, j)]
                yr, yi = y[j]
                ar = ar - (br * yr - bi * yi)
                ai = ai - (br * yi + bi * yr)
            y[k] = (ar * linv[k], ai * linv[k])
        # adjoint: L^H z = y
        z = [None] * c
        for k in range(c - 1, -1, -1):
            ar, ai = y[k]
            for j in range(k + 1, c):
                # conj(L[j,k]) * z[j]
                br, bi = l[(j, k)]
                zr, zi = z[j]
                ar = ar - (br * zr + bi * zi)
                ai = ai - (br * zi - bi * zr)
            z[k] = (ar * linv[k], ai * linv[k])
        # denom = d^H z;  w = z / denom  (guarded like the XLA path)
        nr = jnp.zeros_like(tr)
        ni = jnp.zeros_like(tr)
        for k in range(c):
            dr, di = d[k]
            zr, zi = z[k]
            nr = nr + (dr * zr + di * zi)
            ni = ni + (dr * zi - di * zr)
        mag = jnp.sqrt(nr * nr + ni * ni)
        ok = mag > np.float32(1e-12)
        nr = jnp.where(ok, nr, np.float32(1e-12))
        ni = jnp.where(ok, ni, np.float32(0.0))
        sc = np.float32(1.0) / (nr * nr + ni * ni)
        for k in range(c):
            zr, zi = z[k]
            wset(src, k, (zr * nr + zi * ni) * sc, (zi * nr - zr * ni) * sc)


def _kernel(c: int, s: int, delta: float, cov_ref, st_ref, out_ref):
    """cov_ref [2C^2, T], st_ref/out_ref [2SC, T]; all fp32 rows."""
    _solve_math(
        c, s, delta,
        lambda i, j: cov_ref[i * c + j, :],
        lambda i, j: cov_ref[c * c + i * c + j, :],
        lambda src, k: (st_ref[src * 2 * c + k, :],
                        st_ref[src * 2 * c + c + k, :]),
        lambda src, k, wr, wi: (
            out_ref.__setitem__((src * 2 * c + k, slice(None)), wr),
            out_ref.__setitem__((src * 2 * c + c + k, slice(None)), wi)),
    )


def _kernel_rows(c: int, s: int, delta: float, cov_ref, st_ref, out_ref):
    """Per-block variant consuming covprefix's native rows layout:
    cov_ref [1, 2C^2, F_pad], st_ref/out_ref [1, 2SC, F_pad]."""
    _solve_math(
        c, s, delta,
        lambda i, j: cov_ref[0, i * c + j, :],
        lambda i, j: cov_ref[0, c * c + i * c + j, :],
        lambda src, k: (st_ref[0, src * 2 * c + k, :],
                        st_ref[0, src * 2 * c + c + k, :]),
        lambda src, k, wr, wi: (
            out_ref.__setitem__((0, src * 2 * c + k, slice(None)), wr),
            out_ref.__setitem__((0, src * 2 * c + c + k, slice(None)), wi)),
    )


def weights_blocks_fused_rows(cov_rows: jnp.ndarray, steer: jnp.ndarray,
                              diag_load: float, f: int) -> jnp.ndarray:
    """Weights from covprefix's NATIVE rows output — the fused-to-fused
    fast path (no complex [B, F, C, C] round trip between the kernels).

    Args:
      cov_rows: float32 [B, 2C^2, F_pad] (covprefix.block_prefixes_rows).
      steer: complex [B, (S,) C, F]; f: the true bin count (<= F_pad).
    Returns:
      w complex [B, (S,) C, F].  Pad bins carry zero covariance and zero
      steering; the pivot/denominator floors keep them finite and they
      are sliced away here.
    """
    b, rows, f_pad = cov_rows.shape
    c = int(np.sqrt(rows // 2))
    # arbitrary leading source axes (matching the XLA weights_blocks
    # contract, ADVICE r4): flatten them all into s, restore on output
    extra_shape = steer.shape[1:-2]
    s = int(np.prod(extra_shape)) if extra_shape else 1
    st = steer.reshape(b, s, c, f)
    st_rows = jnp.stack([jnp.real(st), jnp.imag(st)], axis=2)  # [B,S,2,C,F]
    st_rows = jnp.pad(st_rows.reshape(b, s * 2 * c, f),
                      ((0, 0), (0, 0), (0, f_pad - f)))

    out = pl.pallas_call(
        functools.partial(_kernel_rows, c, s, float(diag_load)),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, rows, f_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * s * c, f_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * s * c, f_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2 * s * c, f_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=int(b * f_pad * (c ** 3 * 4 + s * c * c * 16)),
            bytes_accessed=4 * b * f_pad * (rows + 4 * s * c),
            transcendentals=b * c,
        ),
        interpret=dispatch.interpret_mode(),
    )(cov_rows, st_rows)

    wr = out.reshape(b, s, 2, c, f_pad)[..., :f]          # [B, S, 2, C, F]
    w = jax.lax.complex(wr[:, :, 0], wr[:, :, 1])         # [B, S, C, F]
    return (w.reshape((b,) + extra_shape + (c, f)) if extra_shape
            else w[:, 0])


def weights_blocks_fused(covs: jnp.ndarray, steer: jnp.ndarray,
                         diag_load: float) -> jnp.ndarray:
    """Drop-in fused path for mvdr.weights_blocks (same contract:
    covs complex [B, F, C, C], steer complex [B, (S,) C, F] ->
    w complex [B, (S,) C, F])."""
    b, f, c, _ = covs.shape
    # arbitrary leading source axes (matching the XLA weights_blocks
    # contract, ADVICE r4): flatten them all into s, restore on output
    extra_shape = steer.shape[1:-2]
    s = int(np.prod(extra_shape)) if extra_shape else 1
    n = b * f
    n_pad = _round_up(n, _TILE)

    # rows layout: (block, bin) pairs flattened onto the lane axis
    cov_rows = jnp.moveaxis(covs.reshape(n, c, c), 0, -1).reshape(c * c, n)
    cov_rows = jnp.concatenate([jnp.real(cov_rows), jnp.imag(cov_rows)])
    st = steer.reshape(b, s, c, f)                        # [B, S, C, F]
    st_rows = jnp.moveaxis(st, 0, -2).reshape(s, c, n)    # [S, C, B*F]
    # per-source row grouping: [src*2C + k] = re, [src*2C + C + k] = im
    st_rows = jnp.concatenate([jnp.real(st_rows), jnp.imag(st_rows)],
                              axis=1).reshape(s * 2 * c, n)
    pad = ((0, 0), (0, n_pad - n))
    cov_rows = jnp.pad(cov_rows, pad)
    st_rows = jnp.pad(st_rows, pad)

    out = pl.pallas_call(
        functools.partial(_kernel, c, s, float(diag_load)),
        grid=(n_pad // _TILE,),
        in_specs=[
            pl.BlockSpec((2 * c * c, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * s * c, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * s * c, _TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * s * c, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=int(n_pad * (c ** 3 * 4 + s * c * c * 16)),
            bytes_accessed=4 * n_pad * (2 * c * c + 4 * s * c),
            transcendentals=n_pad * c // _TILE,
        ),
        interpret=dispatch.interpret_mode(),
    )(cov_rows, st_rows)

    wr = out.reshape(s, 2, c, n_pad)[..., :n]             # [S, 2, C, B*F]
    w = jax.lax.complex(wr[:, 0], wr[:, 1])               # [S, C, B*F]
    w = jnp.moveaxis(w.reshape(s, c, b, f), 2, 0)         # [B, S, C, F]
    return (w.reshape((b,) + extra_shape + (c, f)) if extra_shape
            else w[:, 0])
