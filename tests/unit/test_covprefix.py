"""Fused covariance-prefix kernel vs the einsum reference (C8 native tier).

Runs the Pallas kernel in interpret mode on CPU (the CI 'fake backend' of
SURVEY.md §4.2.5) against covariance.block_prefixes' einsum+scan form.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcax.algos import covariance as cov_mod
from mcax.kernels import covprefix


def _spectra(c, m, f, seed=0):
    rng = np.random.default_rng(seed)
    return jax.lax.complex(
        jnp.asarray(rng.standard_normal((c, m, f)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((c, m, f)).astype(np.float32)))


@pytest.mark.parametrize("c,b,t,f", [
    (8, 4, 24, 513),     # config4's shapes (small B), F % 128 != 0
    (16, 3, 16, 257),    # config5's channel count
    (2, 5, 8, 128),      # lane-exact F, tiny array
    (4, 1, 24, 100),     # single block, short F
])
def test_fused_matches_einsum(monkeypatch, c, b, t, f):
    monkeypatch.setenv("MCAX_PALLAS_INTERPRET", "1")
    spec = _spectra(c, b * t, f)
    ref = cov_mod.block_prefixes(spec, None, 0.93, t)
    got = covprefix.block_prefixes_fused(spec, None, 0.93, t)
    assert got.shape == ref.shape == (b, f, c, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_fused_matches_einsum_with_seed(monkeypatch):
    monkeypatch.setenv("MCAX_PALLAS_INTERPRET", "1")
    c, b, t, f = 8, 3, 24, 257
    spec = _spectra(c, b * t, f, seed=1)
    rng = np.random.default_rng(2)
    a = rng.standard_normal((f, c, c)) + 1j * rng.standard_normal((f, c, c))
    cov0 = jnp.asarray(a + np.conj(np.swapaxes(a, -1, -2)),
                       jnp.complex64)                     # Hermitian seed
    ref = cov_mod.block_prefixes(spec, cov0, 0.88, t)
    got = covprefix.block_prefixes_fused(spec, cov0, 0.88, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-4, rtol=5e-4)


def test_fused_prefix_is_hermitian(monkeypatch):
    monkeypatch.setenv("MCAX_PALLAS_INTERPRET", "1")
    spec = _spectra(4, 2 * 8, 64, seed=3)
    got = np.asarray(covprefix.block_prefixes_fused(spec, None, 0.9, 8))
    np.testing.assert_allclose(got, np.conj(np.swapaxes(got, -1, -2)),
                               atol=1e-5)


def test_cov_backend_knob(monkeypatch):
    from mcax.kernels import dispatch
    monkeypatch.setenv("MCAX_COV", "xla")
    assert dispatch.cov_backend() == "xla"
    monkeypatch.setenv("MCAX_COV", "pallas")
    assert dispatch.cov_backend() == "fused"
    monkeypatch.setenv("MCAX_COV", "bogus")
    with pytest.raises(ValueError):
        dispatch.cov_backend()
