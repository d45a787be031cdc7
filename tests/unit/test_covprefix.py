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
from tests.helpers import complex_to_device, to_host

_ON_TPU = jax.default_backend() in ("tpu", "axon")


def _interpret(monkeypatch):
    """Interpret mode on CPU CI; the compiled kernel on the real chip."""
    if not _ON_TPU:
        monkeypatch.setenv("MCAX_PALLAS_INTERPRET", "1")


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
    _interpret(monkeypatch)
    # Pin the reference to the einsum path: on a TPU runner block_prefixes
    # itself would dispatch to the fused kernel, making the test vacuous.
    monkeypatch.setenv("MCAX_COV", "xla")
    spec = _spectra(c, b * t, f)
    ref = cov_mod.block_prefixes(spec, None, 0.93, t)
    got = covprefix.block_prefixes_fused(spec, None, 0.93, t)
    assert got.shape == ref.shape == (b, f, c, c)
    np.testing.assert_allclose(to_host(got), to_host(ref),
                               atol=2e-4, rtol=2e-4)


def test_fused_matches_einsum_with_seed(monkeypatch):
    _interpret(monkeypatch)
    monkeypatch.setenv("MCAX_COV", "xla")   # einsum reference, any backend
    c, b, t, f = 8, 3, 24, 257
    spec = _spectra(c, b * t, f, seed=1)
    rng = np.random.default_rng(2)
    a = rng.standard_normal((f, c, c)) + 1j * rng.standard_normal((f, c, c))
    cov0 = complex_to_device(
        (a + np.conj(np.swapaxes(a, -1, -2))).astype(np.complex64))
    ref = cov_mod.block_prefixes(spec, cov0, 0.88, t)
    got = covprefix.block_prefixes_fused(spec, cov0, 0.88, t)
    np.testing.assert_allclose(to_host(got), to_host(ref),
                               atol=5e-4, rtol=5e-4)


def test_fused_prefix_is_hermitian(monkeypatch):
    _interpret(monkeypatch)
    spec = _spectra(4, 2 * 8, 64, seed=3)
    got = to_host(covprefix.block_prefixes_fused(spec, None, 0.9, 8))
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


def test_global_backend_escape_hatch(monkeypatch):
    """MCAX_BACKEND=xla is the global correctness fallback: it must
    disable the fused cov and SRP kernels even in their 'auto' modes."""
    from mcax.kernels import dispatch
    monkeypatch.delenv("MCAX_COV", raising=False)
    monkeypatch.delenv("MCAX_SRP", raising=False)
    monkeypatch.setenv("MCAX_BACKEND", "xla")
    assert dispatch.cov_backend() == "xla"
    assert dispatch.srp_backend() == "xla"
    monkeypatch.setenv("MCAX_BACKEND", "pallas")
    assert dispatch.cov_backend() == "fused"
    assert dispatch.srp_backend() == "fused"


def test_forget_domain_enforced():
    spec = _spectra(2, 8, 64)
    with pytest.raises(ValueError):
        covprefix.block_prefixes_fused(spec, None, 0.0, 4)
