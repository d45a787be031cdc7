import jax
import numpy as np
import pytest

from mcax.kernels import dispatch
from mcax.kernels import fft as kfft
from tests.helpers import complex_to_device, to_host

_ON_TPU = jax.default_backend() in ("tpu", "axon")


def test_fft_backend_dispatch(monkeypatch):
    """MCAX_FFT selects the FFT tier; auto ships the measured winner
    (matmul on TPU, jnp.fft elsewhere); MCAX_BACKEND still forces a tier."""
    monkeypatch.setenv("MCAX_FFT", "matmul")
    assert dispatch.fft_backend() == "matmul"
    monkeypatch.setenv("MCAX_FFT", "bogus")
    with pytest.raises(ValueError):
        dispatch.fft_backend()
    monkeypatch.delenv("MCAX_FFT")
    monkeypatch.setenv("MCAX_BACKEND", "pallas")
    assert dispatch.fft_backend() == "pallas"
    monkeypatch.setenv("MCAX_BACKEND", "xla")
    assert dispatch.fft_backend() == "xla"
    # the matmul route produces the same spectra as the xla route
    rng = np.random.default_rng(7)
    x = rng.standard_normal((4, 512)).astype(np.float32)
    monkeypatch.setenv("MCAX_FFT", "matmul")
    got = to_host(kfft.rfft(x))
    np.testing.assert_allclose(got, np.fft.rfft(x, axis=-1), atol=2e-3)


def test_fft_precision_knob(monkeypatch):
    """MCAX_FFT_PRECISION=high (bf16x3) stays within ~99 dB of the fp64
    reference — the measured 1.3x speed knob of PERF.md round 3."""
    rng = np.random.default_rng(8)
    x = rng.standard_normal((16, 512)).astype(np.float32)
    want = np.fft.rfft(x.astype(np.float64), axis=-1)
    monkeypatch.setenv("MCAX_FFT_PRECISION", "high")
    got = to_host(kfft.rfft_matmul(x))
    snr = 10 * np.log10(np.mean(np.abs(want) ** 2)
                        / np.mean(np.abs(got - want) ** 2))
    assert snr > 80.0, snr
    monkeypatch.setenv("MCAX_FFT_PRECISION", "bogus")
    with pytest.raises(ValueError):
        kfft._prec()


@pytest.mark.parametrize("n", [512, 1024])
def test_rfft_matmul_matches_numpy(n):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, n)).astype(np.float32)
    got = to_host(kfft.rfft_matmul(x))
    want = np.fft.rfft(x.astype(np.float64), axis=-1)
    np.testing.assert_allclose(got, want, atol=2e-3)


@pytest.mark.parametrize("n", [512, 1024])
def test_irfft_matmul_roundtrip(n):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((8, n)).astype(np.float32)
    y = complex_to_device(np.fft.rfft(x, axis=-1).astype(np.complex64))
    got = np.asarray(kfft.irfft_matmul(y, n))
    np.testing.assert_allclose(got, x, atol=2e-3)


def test_rfft_dispatch_xla():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 3, 512)).astype(np.float32)
    got = to_host(kfft.rfft(x))
    want = np.fft.rfft(x, axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-3)


@pytest.mark.parametrize("n", [512, 1024])
def test_pallas_rfft_interpret(n, monkeypatch):
    monkeypatch.setenv("MCAX_BACKEND", "pallas")
    if not _ON_TPU:
        monkeypatch.setenv("MCAX_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(3)
    x = rng.standard_normal((3, 5, n)).astype(np.float32)
    got = to_host(kfft.rfft(x))
    want = np.fft.rfft(x.astype(np.float64), axis=-1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-3)


@pytest.mark.parametrize("n", [512, 1024])
def test_pallas_irfft_interpret(n, monkeypatch):
    monkeypatch.setenv("MCAX_BACKEND", "pallas")
    if not _ON_TPU:
        monkeypatch.setenv("MCAX_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(4)
    x = rng.standard_normal((6, n)).astype(np.float32)
    y = complex_to_device(np.fft.rfft(x, axis=-1).astype(np.complex64))
    got = np.asarray(kfft.irfft(y, n))
    np.testing.assert_allclose(got, x, atol=3e-3)


@pytest.mark.parametrize("c,nblk,hop,tb_env", [
    (3, 10, 256, None),       # config1-3 frame size, small T
    (2, 49, 512, "16"),       # config4/5 frame size; T=48 = 3 tiles of 16
    (1, 26, 256, "8"),        # T=25: last tile partial + clamped boundary
])
def test_stft_fused_matches_xla(monkeypatch, c, nblk, hop, tb_env):
    """The fused framing+DFT kernel reproduces the frame_signal + matmul
    chain bit-for-tolerance at the same precision tier, including partial
    last tiles and the clamped boundary block (r5)."""
    from mcax.frames import stft as stft_mod
    from mcax.frames import window as win_mod
    from mcax.kernels import stft_fused

    if not _ON_TPU:
        monkeypatch.setenv("MCAX_PALLAS_INTERPRET", "1")
    if tb_env is not None:
        monkeypatch.setattr(stft_fused, "_pick_tb",
                            lambda hop_, fp_, t_: int(tb_env))
    n = 2 * hop
    win = win_mod.hann(n)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((c, nblk * hop)).astype(np.float32)

    def run(backend):
        monkeypatch.setenv("MCAX_STFT", backend)
        if backend == "xla":
            monkeypatch.setenv("MCAX_BACKEND", "xla")
        else:
            monkeypatch.setenv("MCAX_BACKEND", "pallas")

        @jax.jit
        def go(xx):
            sp = stft_mod.stft(xx, win, hop)
            return jnp_real_imag(sp)
        return [np.asarray(v) for v in go(x)]

    import jax.numpy as jnp

    def jnp_real_imag(sp):
        return jnp.real(sp), jnp.imag(sp)

    got_re, got_im = run("fused")
    want_re, want_im = run("xla")
    assert got_re.shape == want_re.shape == (c, nblk - 1, hop + 1)
    scale = max(np.abs(want_re).max(), np.abs(want_im).max()) + 1e-12
    # same tier both sides off-TPU (fp32); on TPU fused=x3 vs xla=HIGH —
    # both bf16x3-class, but summation structure differs
    atol = 2e-4 if _ON_TPU else 2e-6
    np.testing.assert_allclose(got_re / scale, want_re / scale, atol=atol)
    np.testing.assert_allclose(got_im / scale, want_im / scale, atol=atol)


@pytest.mark.parametrize("b,c,hop,tprime", [(5, 3, 256, 16), (3, 2, 512, 8)])
def test_stft_fused_from_blocks_matches_concat(monkeypatch, b, c, hop,
                                               tprime):
    """The blocks-native fused analysis (reads [B, C, T, hop] directly,
    carry + cross-block boundaries in-kernel) equals the concat-then-stft
    chain frame-for-frame (r5)."""
    from mcax.frames import stft as stft_mod
    from mcax.frames import window as win_mod
    from mcax.kernels import stft_fused

    if not _ON_TPU:
        monkeypatch.setenv("MCAX_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("MCAX_BACKEND", "pallas")
    monkeypatch.setenv("MCAX_STFT", "fused")
    n = 2 * hop
    win = win_mod.hann(n)
    rng = np.random.default_rng(8)
    samples = rng.standard_normal((b, c, tprime * hop)).astype(np.float32)
    carry = rng.standard_normal((c, hop)).astype(np.float32)

    import jax.numpy as jnp

    @jax.jit
    def fused(s, cr):
        re, im, nc = stft_fused.stft_fused_from_blocks(s, cr, win, hop)
        return re, im, nc

    @jax.jit
    def ref(s, cr):
        flat = jnp.moveaxis(s, 1, 0).reshape(c, -1)
        x = jnp.concatenate([cr, flat], axis=-1)
        sp = stft_mod.stft(x, win, hop)
        return jnp.real(sp), jnp.imag(sp), x[:, b * tprime * hop:]

    got_re, got_im, got_c = (np.asarray(v) for v in fused(samples, carry))
    want_re, want_im, want_c = (np.asarray(v) for v in ref(samples, carry))
    assert got_re.shape == want_re.shape == (c, b * tprime, hop + 1)
    scale = max(np.abs(want_re).max(), np.abs(want_im).max()) + 1e-12
    np.testing.assert_allclose(got_re / scale, want_re / scale, atol=3e-6)
    np.testing.assert_allclose(got_im / scale, want_im / scale, atol=3e-6)
    np.testing.assert_array_equal(got_c, want_c)
