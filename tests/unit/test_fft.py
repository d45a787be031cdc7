import numpy as np
import pytest

from mcax.kernels import fft as kfft


@pytest.mark.parametrize("n", [512, 1024])
def test_rfft_matmul_matches_numpy(n):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, n)).astype(np.float32)
    got = np.asarray(kfft.rfft_matmul(x))
    want = np.fft.rfft(x.astype(np.float64), axis=-1)
    np.testing.assert_allclose(got, want, atol=2e-3)


@pytest.mark.parametrize("n", [512, 1024])
def test_irfft_matmul_roundtrip(n):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((8, n)).astype(np.float32)
    y = np.fft.rfft(x, axis=-1).astype(np.complex64)
    got = np.asarray(kfft.irfft_matmul(y, n))
    np.testing.assert_allclose(got, x, atol=2e-3)


def test_rfft_dispatch_xla():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 3, 512)).astype(np.float32)
    got = np.asarray(kfft.rfft(x))
    want = np.fft.rfft(x, axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-3)


@pytest.mark.parametrize("n", [512, 1024])
def test_pallas_rfft_interpret(n, monkeypatch):
    monkeypatch.setenv("MCAX_BACKEND", "pallas")
    monkeypatch.setenv("MCAX_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(3)
    x = rng.standard_normal((3, 5, n)).astype(np.float32)
    got = np.asarray(kfft.rfft(x))
    want = np.fft.rfft(x.astype(np.float64), axis=-1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-3)


@pytest.mark.parametrize("n", [512, 1024])
def test_pallas_irfft_interpret(n, monkeypatch):
    monkeypatch.setenv("MCAX_BACKEND", "pallas")
    monkeypatch.setenv("MCAX_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(4)
    x = rng.standard_normal((6, n)).astype(np.float32)
    y = np.fft.rfft(x, axis=-1).astype(np.complex64)
    got = np.asarray(kfft.irfft(y, n))
    np.testing.assert_allclose(got, x, atol=3e-3)
