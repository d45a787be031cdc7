"""MVDR beamformer (component C9, SURVEY.md §3.4).

w[f] = R[f]^{-1} d[f] / (d[f]^H R[f]^{-1} d[f]) per bin, applied to every
frame of the block: Y[t, f] = w[f]^H X[:, t, f].

Numerics (SURVEY.md §7.4 "MVDR numerics"): the complex Hermitian solve is an
unrolled complex Cholesky L L^H built from batch-vectorized elementwise ops
(stock ``lax.linalg.cholesky`` stalls this backend's compiler at the shipped
batch sizes, and complex64 exists only *inside* the jitted step — XLA lowers
it to fp32 re/im VPU pairs, never the bf16 MXU path); fp32 everywhere in the
solve, diagonal loading applied before factorisation, validated against
numpy complex solves in fp64.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mcax.algos import covariance as cov_mod


def _cholesky_complex_unrolled(a: jnp.ndarray) -> jnp.ndarray:
    """Batched complex Cholesky a = L L^H by static right-looking unroll.

    n is small (C <= 16), so an unrolled sweep of batch-vectorized VPU ops
    both compiles fast and runs fast on TPU (the stock lax.linalg.cholesky
    lowering stalls this backend's compiler at the shipped batch sizes).
    Each step extracts one column from the running residual and subtracts
    its outer product — elementwise ops only: no ``.at[].set`` of L (a
    dynamic-update-slice per column made XLA copy the whole batched tensor
    n times) and no dot/einsum contractions (TPU defaults them to bf16
    passes, whose error can push the residual diagonal negative).  Complex
    arithmetic rather than the doubled [2C, 2C] real embedding: n steps on
    [..., n, n] complex instead of 2n steps on 4x the elements — ~4x less
    memory traffic, which dominates at config5's batched shapes."""
    n = a.shape[-1]
    resid = a
    cols = []
    row_ge = [jnp.asarray((np.arange(n) >= j), jnp.float32)
              for j in range(n)]
    for j in range(n):
        # Hermitian PD ⇒ the residual diagonal is real(+); take the real
        # part explicitly so roundoff imag can't leak into the pivot
        d = jnp.sqrt(jnp.maximum(jnp.real(resid[..., j, j]), 1e-30))
        col = (resid[..., :, j] / d[..., None].astype(a.dtype)
               ) * row_ge[j].astype(a.dtype)
        cols.append(col)
        if j + 1 < n:
            resid = resid - col[..., :, None] * jnp.conj(col[..., None, :])
    return jnp.stack(cols, axis=-1)


def _solve_lower_complex(l: jnp.ndarray, b: jnp.ndarray,
                         adjoint: bool) -> jnp.ndarray:
    """Solve L y = b (adjoint=False) or L^H y = b (adjoint=True).

    Column sweep: once y_k is known, its contribution is subtracted from
    the whole remainder in one vector op — n elementwise steps instead of
    n^2/2 scalar-slice ops.  Entries at already-consumed indices pick up
    garbage in ``rem``, which is harmless: each rem[..., k] is read exactly
    once, before its update."""
    n = l.shape[-1]
    ys = [None] * n
    rem = b
    order = range(n - 1, -1, -1) if adjoint else range(n)
    for k in order:
        dk = l[..., k, k]
        yk = rem[..., k] / (jnp.conj(dk) if adjoint else dk)
        ys[k] = yk
        contrib = jnp.conj(l[..., k, :]) if adjoint else l[..., :, k]
        rem = rem - contrib * yk[..., None]
    return jnp.stack(ys, axis=-1)


def hermitian_solve(r: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Solve R y = d for Hermitian positive-definite R, batched.

    Args:
      r: complex64 [..., C, C] (Hermitian PD — diagonally loaded upstream).
      d: complex64 [..., C].  Extra *leading* axes on d (e.g. sources)
        broadcast against r, sharing ONE factorisation of each R.
    Returns:
      y: complex64 [..., C].

    Complex Cholesky (L L^H) with unrolled right-looking updates and
    column-sweep substitutions; fp32 re/im planes throughout (XLA lowers
    the complex elementwise ops to fp32 VPU pairs — no MXU, no bf16)."""
    chol = _cholesky_complex_unrolled(r)
    y = _solve_lower_complex(chol, d, adjoint=False)
    return _solve_lower_complex(chol, y, adjoint=True)


def weights(cov: jnp.ndarray, steer: jnp.ndarray, diag_load: float) -> jnp.ndarray:
    """MVDR weights per bin.

    Args:
      cov: complex64 [F, C, C] spatial covariance.
      steer: complex64 steering vector [..., C, F] (leading axes = sources).
    Returns:
      w: complex64 [..., C, F] with the distortionless property w^H d = 1.

    The Cholesky factorisation runs ONCE on [F, C, C] and is shared across
    all leading (source) axes of ``steer`` — per-source work is only the two
    triangular substitutions (the reference re-solves per source; config5's
    two tracked sources share one R, so sharing the O(C^3) factor halves the
    dominant term; VERDICT.md round-1 item 3).
    """
    r = cov_mod.loaded(cov, diag_load)                     # [F, C, C]
    d = jnp.moveaxis(steer, -1, -2)                        # [..., F, C]
    chol = _cholesky_complex_unrolled(r)                   # factor once
    y = _solve_lower_complex(chol, d, adjoint=False)       # broadcasts over
    y = _solve_lower_complex(chol, y, adjoint=True)        # leading axes
    denom = jnp.sum(jnp.conj(d) * y, axis=-1, keepdims=True)
    denom = jnp.where(jnp.abs(denom) > 1e-12, denom,
                      jnp.asarray(1e-12, denom.dtype))
    w = y / denom                                          # [..., F, C]
    return jnp.moveaxis(w, -1, -2)                         # [..., C, F]


def weights_blocks(covs: jnp.ndarray, steer: jnp.ndarray,
                   diag_load: float) -> jnp.ndarray:
    """MVDR weights for a batch of blocks — the throughput-mode form.

    Args:
      covs: complex64 [B, F, C, C] per-block covariances.
      steer: complex64 [B, (S,) C, F] per-block steering vectors (optional
        source axes between B and C).
    Returns:
      w: complex64 [B, (S,) C, F].

    Equivalent to ``vmap(weights)`` but factorises on the FLAT [B*F, C, C]
    batch: measured on the v5e, XLA runs the unrolled Cholesky 4x faster
    on the flat batch than on the nested [B, F, C, C] one (config5's
    dominant cost, VERDICT.md round-1 item 3), and the factorisation is
    still shared across all source axes.
    """
    from mcax.kernels import dispatch as _dispatch
    if _dispatch.mvdr_backend() == "fused":
        from mcax.kernels import mvdrsolve
        return mvdrsolve.weights_blocks_fused(covs, steer, diag_load)
    b, f, c, _ = covs.shape
    r = cov_mod.loaded(covs, diag_load)                    # [B, F, C, C]
    chol = _cholesky_complex_unrolled(
        r.reshape(b * f, c, c)).reshape(r.shape)
    d = jnp.moveaxis(steer, -1, -2)                        # [B, (S,) F, C]
    extra = d.ndim - 3                                     # source axes
    cholb = chol.reshape(b, *([1] * extra), f, c, c)
    y = _solve_lower_complex(cholb, d, adjoint=False)
    y = _solve_lower_complex(cholb, y, adjoint=True)
    denom = jnp.sum(jnp.conj(d) * y, axis=-1, keepdims=True)
    denom = jnp.where(jnp.abs(denom) > 1e-12, denom,
                      jnp.asarray(1e-12, denom.dtype))
    return jnp.moveaxis(y / denom, -1, -2)                 # [B, (S,) C, F]


def weights_and_cov_from_spectra(spectra: jnp.ndarray, cov0, forget: float,
                                 frames_per_block: int, steer: jnp.ndarray,
                                 diag_load: float):
    """Covariance prefixes + MVDR weights in one dispatch-aware step.

    When BOTH the covariance-prefix and MVDR-solve kernels are the
    dispatched backends, covprefix's native [B, 2C^2, F_pad] rows feed
    the solve kernel directly — skipping the complex [B, F, C, C] round
    trip between them (two full-tensor layout transposes, ~0.35 ms at
    the config-4 batched shape — r4 profile).  Otherwise the plain
    covs -> weights_blocks chain runs.

    Returns (w [B, (S,) C, F], new_cov [F, C, C] — the last block's
    covariance for the streaming state).
    """
    from mcax.kernels import dispatch as _dispatch
    if (_dispatch.cov_backend() == "fused"
            and _dispatch.mvdr_backend() == "fused"):
        from mcax.kernels import covprefix, mvdrsolve
        rows, f = covprefix.block_prefixes_rows(spectra, cov0, forget,
                                                frames_per_block)
        w = mvdrsolve.weights_blocks_fused_rows(rows, steer, diag_load, f)
        new_cov = covprefix.rows_to_complex(rows[-1:], f)[0]
        return w, new_cov
    covs = cov_mod.block_prefixes(spectra, cov0, forget, frames_per_block)
    return weights_blocks(covs, steer, diag_load), covs[-1]


def beamform(spectra: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Apply weights: Y = w^H X.

    Args:
      spectra: complex64 [C, T, F].
      w: complex64 [..., C, F] (leading axes = sources).
    Returns:
      complex64 [..., T, F].
    """
    return jnp.einsum("...cf,ctf->...tf", jnp.conj(w), spectra,
                      precision=jax.lax.Precision.HIGHEST)
