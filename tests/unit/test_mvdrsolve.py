"""Fused MVDR weight-solve kernel vs the unrolled XLA reference (C9).

Interpret mode on CPU (SURVEY.md §4.2.5); the on-chip lane
(MCAX_TEST_PLATFORM=tpu) runs the compiled kernel.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcax.algos import mvdr
from mcax.kernels import mvdrsolve

_ON_TPU = jax.default_backend() in ("tpu", "axon")


def _interpret(monkeypatch):
    if not _ON_TPU:
        monkeypatch.setenv("MCAX_PALLAS_INTERPRET", "1")


def _cov_steer(b, f, c, s=0, seed=0):
    """Well-conditioned Hermitian-PD covariances + unit steering (numpy)."""
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal((b, f, c, 3 * c))
         + 1j * rng.standard_normal((b, f, c, 3 * c))).astype(np.complex64)
    r = (x @ np.conj(np.swapaxes(x, -1, -2)) / (3 * c)).astype(np.complex64)
    shape = (b, s, c, f) if s else (b, c, f)
    ph = rng.uniform(-np.pi, np.pi, shape).astype(np.float32)
    d = np.exp(1j * ph).astype(np.complex64)
    return r, d


def _weights_planes(fn, covs_np, steer_np, delta):
    """Run a weights fn inside ONE jit with float re/im-plane boundaries
    (the production pattern — the axon backend implements neither complex
    transfers nor several eager complex ops) and return numpy complex."""

    @jax.jit
    def run(cr, ci, sr, si):
        w = fn(jax.lax.complex(cr, ci), jax.lax.complex(sr, si), delta)
        return jnp.real(w), jnp.imag(w)

    wr, wi = run(np.ascontiguousarray(covs_np.real),
                 np.ascontiguousarray(covs_np.imag),
                 np.ascontiguousarray(steer_np.real),
                 np.ascontiguousarray(steer_np.imag))
    return np.asarray(wr) + 1j * np.asarray(wi)


@pytest.mark.parametrize("b,f,c,s", [
    (4, 513, 8, 0),      # config4: non-tile-multiple B*F
    (3, 257, 16, 2),     # config5: 16 mics, 2 sources sharing one factor
    (2, 128, 4, 0),
    (1, 64, 2, 3),
])
def test_fused_weights_match_xla(monkeypatch, b, f, c, s):
    _interpret(monkeypatch)
    monkeypatch.setenv("MCAX_MVDR", "xla")   # pin the reference path
    covs, steer = _cov_steer(b, f, c, s)
    want = _weights_planes(mvdr.weights_blocks, covs, steer, 0.01)
    got = _weights_planes(mvdrsolve.weights_blocks_fused, covs, steer, 0.01)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_fused_weights_two_source_axes(monkeypatch):
    """steer with TWO leading source axes [B, S1, S2, C, F] follows the
    XLA weights_blocks contract (ADVICE r4: the fused path assumed at
    most one and raised or silently misinterpreted axes)."""
    _interpret(monkeypatch)
    monkeypatch.setenv("MCAX_MVDR", "xla")   # pin the reference path
    covs, steer = _cov_steer(2, 96, 4, s=6, seed=11)
    steer = steer.reshape(2, 3, 2, 4, 96)                  # [B, 3, 2, C, F]
    want = _weights_planes(mvdr.weights_blocks, covs, steer, 0.01)
    got = _weights_planes(mvdrsolve.weights_blocks_fused, covs, steer, 0.01)
    assert got.shape == want.shape == steer.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_fused_weights_distortionless(monkeypatch):
    """w^H d = 1 (the MVDR constraint) holds bin-wise for the kernel."""
    _interpret(monkeypatch)
    covs, steer = _cov_steer(3, 200, 8, seed=5)
    w = _weights_planes(mvdrsolve.weights_blocks_fused, covs, steer, 0.05)
    resp = np.sum(np.conj(w) * steer, axis=-2)             # [B, F]
    np.testing.assert_allclose(resp, np.ones((3, 200)), atol=1e-3)


def test_mvdr_backend_knob(monkeypatch):
    from mcax.kernels import dispatch
    monkeypatch.setenv("MCAX_MVDR", "xla")
    assert dispatch.mvdr_backend() == "xla"
    monkeypatch.setenv("MCAX_MVDR", "pallas")
    assert dispatch.mvdr_backend() == "fused"
    monkeypatch.setenv("MCAX_MVDR", "bogus")
    with pytest.raises(ValueError):
        dispatch.mvdr_backend()
    monkeypatch.delenv("MCAX_MVDR")
    monkeypatch.setenv("MCAX_BACKEND", "xla")   # global escape hatch
    assert dispatch.mvdr_backend() == "xla"


def test_weights_blocks_dispatches_fused(monkeypatch):
    """weights_blocks itself routes to the kernel under MCAX_MVDR=fused."""
    _interpret(monkeypatch)
    covs, steer = _cov_steer(2, 96, 4, seed=7)
    monkeypatch.setenv("MCAX_MVDR", "xla")
    want = _weights_planes(mvdr.weights_blocks, covs, steer, 0.01)
    monkeypatch.setenv("MCAX_MVDR", "fused")
    got = _weights_planes(mvdr.weights_blocks, covs, steer, 0.01)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_rows_fast_path_matches_xla(monkeypatch):
    """The fused-to-fused rows path (covprefix rows feeding the solve
    kernel with no complex [B,F,C,C] round trip) matches the plain
    covs -> weights chain, including the streaming new_cov."""
    _interpret(monkeypatch)
    rng = np.random.default_rng(9)
    c, b, t, f = 8, 3, 24, 513
    sr = rng.standard_normal((c, b * t, f)).astype(np.float32)
    si = rng.standard_normal((c, b * t, f)).astype(np.float32)
    ph = rng.uniform(-np.pi, np.pi, (b, c, f)).astype(np.float32)
    cov0_np = np.broadcast_to(np.eye(c, dtype=np.float32) * 1e-3,
                              (f, c, c)).copy()

    def run():
        # one jit per path, float-plane boundaries (axon-safe)
        @jax.jit
        def go(ar, ai, phv, c0):
            spec = jax.lax.complex(ar, ai)
            steer = jax.lax.complex(jnp.cos(phv), jnp.sin(phv))
            cov0 = jax.lax.complex(c0, jnp.zeros_like(c0))
            w, nc = mvdr.weights_and_cov_from_spectra(spec, cov0, 0.93, t,
                                                      steer, 0.01)
            return (jnp.real(w), jnp.imag(w), jnp.real(nc), jnp.imag(nc))
        wr, wi, nr, ni = go(sr, si, ph, cov0_np)
        return (np.asarray(wr) + 1j * np.asarray(wi),
                np.asarray(nr) + 1j * np.asarray(ni))

    monkeypatch.setenv("MCAX_COV", "fused")
    monkeypatch.setenv("MCAX_MVDR", "fused")
    w1, nc1 = run()
    monkeypatch.setenv("MCAX_COV", "xla")
    monkeypatch.setenv("MCAX_MVDR", "xla")
    w2, nc2 = run()
    np.testing.assert_allclose(w1, w2, atol=5e-4, rtol=5e-3)
    np.testing.assert_allclose(nc1, nc2, atol=5e-4, rtol=5e-3)
