"""MVDR beamformer (component C9, SURVEY.md §3.4).

w[f] = R[f]^{-1} d[f] / (d[f]^H R[f]^{-1} d[f]) per bin, applied to every
frame of the block: Y[t, f] = w[f]^H X[:, t, f].

Numerics (SURVEY.md §7.4 "MVDR numerics"): the complex Hermitian solve runs
as an equivalent REAL symmetric-positive-definite system of twice the size,

    [[Rr, -Ri], [Ri, Rr]] [yr; yi] = [dr; di],

because complex Cholesky is not reliably lowered on TPU while real Cholesky
is; fp32 everywhere (never bf16 in the solve), diagonal loading applied
before factorisation, validated against numpy complex solves in fp64.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mcax.algos import covariance as cov_mod


def _cholesky_unrolled(a: jnp.ndarray) -> jnp.ndarray:
    """Batched Cholesky of tiny SPD matrices by static column unroll.

    a: [..., n, n] float32 SPD → lower-triangular L with a = L L^T.

    n is small (2*C <= 32), so an unrolled sweep of batch-vectorized VPU ops
    both compiles fast and runs fast on TPU, whereas the stock
    ``lax.linalg.cholesky`` lowering stalls this backend's compiler at the
    shipped batch sizes ([513, 16, 16] never finishes compiling).

    Right-looking outer-product form: each step extracts one column from the
    running residual and subtracts its outer product — elementwise ops only.
    No ``.at[].set`` updates of L (a dynamic-update-slice per column made
    XLA copy the whole batched tensor n times: ~1 GB of pure copy traffic at
    config4's batched shapes) and no dot/einsum contractions (TPU defaults
    them to bf16 passes, whose error can push the residual diagonal negative
    and blow up the substitution).
    """
    n = a.shape[-1]
    resid = a
    cols = []
    row_ge = [jnp.asarray((np.arange(n) >= j), jnp.float32)    # [n] masks
              for j in range(n)]
    for j in range(n):
        d = jnp.sqrt(jnp.maximum(resid[..., j, j], 1e-30))     # [...]
        col = (resid[..., :, j] / d[..., None]) * row_ge[j]    # [..., n]
        cols.append(col)
        if j + 1 < n:
            resid = resid - col[..., :, None] * col[..., None, :]
    return jnp.stack(cols, axis=-1)


def _solve_triangular_unrolled(l: jnp.ndarray, b: jnp.ndarray,
                               lower: bool) -> jnp.ndarray:
    """Solve L y = b (lower) or L^T y = b (upper) by static substitution.
    l: [..., n, n]; b: [..., n] → y: [..., n].

    Column sweep: once y_k is known, its contribution L[:, k]·y_k (resp.
    L[k, :]·y_k for the transpose) is subtracted from the whole remainder in
    one vector op — n elementwise steps instead of n²/2 scalar-slice ops.
    Entries at indices already consumed pick up garbage in ``rem``, which is
    harmless: each rem[..., k] is read exactly once, before its update."""
    n = l.shape[-1]
    ys = [None] * n
    rem = b
    order = range(n) if lower else range(n - 1, -1, -1)
    for k in order:
        yk = rem[..., k] / l[..., k, k]
        ys[k] = yk
        contrib = l[..., :, k] if lower else l[..., k, :]
        rem = rem - contrib * yk[..., None]
    return jnp.stack(ys, axis=-1)


def hermitian_solve(r: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Solve R y = d for Hermitian positive-definite R, batched.

    Args:
      r: complex64 [..., C, C] (Hermitian PD — diagonally loaded upstream).
      d: complex64 [..., C].
    Returns:
      y: complex64 [..., C].
    """
    c = r.shape[-1]
    rr, ri = jnp.real(r), jnp.imag(r)
    big = jnp.concatenate([
        jnp.concatenate([rr, -ri], axis=-1),
        jnp.concatenate([ri, rr], axis=-1),
    ], axis=-2)                                            # [..., 2C, 2C]
    rhs = jnp.concatenate([jnp.real(d), jnp.imag(d)], axis=-1)
    chol = _cholesky_unrolled(big)
    y = _solve_triangular_unrolled(chol, rhs, lower=True)
    y = _solve_triangular_unrolled(chol, y, lower=False)
    return jax.lax.complex(y[..., :c], y[..., c:])


def weights(cov: jnp.ndarray, steer: jnp.ndarray, diag_load: float) -> jnp.ndarray:
    """MVDR weights per bin.

    Args:
      cov: complex64 [F, C, C] spatial covariance.
      steer: complex64 steering vector [..., C, F] (leading axes = sources).
    Returns:
      w: complex64 [..., C, F] with the distortionless property w^H d = 1.
    """
    r = cov_mod.loaded(cov, diag_load)                     # [F, C, C]
    d = jnp.moveaxis(steer, -1, -2)                        # [..., F, C]
    y = hermitian_solve(jnp.broadcast_to(r, d.shape[:-1] + r.shape[-2:]), d)
    denom = jnp.sum(jnp.conj(d) * y, axis=-1, keepdims=True)
    denom = jnp.where(jnp.abs(denom) > 1e-12, denom,
                      jnp.asarray(1e-12, denom.dtype))
    w = y / denom                                          # [..., F, C]
    return jnp.moveaxis(w, -1, -2)                         # [..., C, F]


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
