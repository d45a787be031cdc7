import numpy as np
import pytest

from mcax.frames import window as win_mod
from mcax.frames import stft as stft_mod
from mcax.frames import ola as ola_mod
from tests.oracle import oracle_np
from tests import helpers


@pytest.mark.parametrize("frame_len,hop", [(512, 256), (1024, 512)])
def test_cola_sqrt_hann(frame_len, hop):
    w = win_mod.sqrt_hann(frame_len)
    assert win_mod.cola_error(w, w, hop) < 1e-6


@pytest.mark.parametrize("frame_len,hop", [(512, 256), (1024, 512)])
def test_cola_hann_unit_synthesis(frame_len, hop):
    wa = win_mod.hann(frame_len)
    ws = np.ones(frame_len, np.float32)
    assert win_mod.cola_error(wa, ws, hop) < 1e-6


def test_framing_matches_oracle():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 4096)).astype(np.float32)
    got = helpers.run_planes(lambda xx: stft_mod.frame_signal(xx, 512, 256),
                             x)
    want = oracle_np.frame_signal(x, 512, 256)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_stft_matches_oracle():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 2048)).astype(np.float32)
    w = win_mod.hann(512)
    got = helpers.run_planes(lambda xx: stft_mod.stft(xx, w, 256), x)
    want = oracle_np.stft(x.astype(np.float64), w, 256)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_ola_matches_oracle():
    rng = np.random.default_rng(2)
    frames = rng.standard_normal((7, 512)).astype(np.float32)
    got = helpers.run_planes(lambda fr: ola_mod.overlap_add(fr, 256),
                             frames)
    want = oracle_np.istft_ola(np.fft.rfft(frames, axis=-1),
                               np.ones(512), 256)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_wola_reconstruction():
    """Analysis+synthesis through STFT/iSTFT/OLA reconstructs the signal
    (steady-state region) to better than -80 dB error (SURVEY.md §4.2.2)."""
    rng = np.random.default_rng(3)
    n = 8192
    x = rng.standard_normal(n).astype(np.float32)
    w = win_mod.sqrt_hann(512)
    y = helpers.run_planes(
        lambda xx: ola_mod.overlap_add(
            stft_mod.istft_frames(stft_mod.stft(xx[None], w, 256), w)[0],
            256), x)
    # steady state: skip the first/last frame of partial overlap
    a, b = 512, y.shape[-1] - 512
    assert helpers.snr_db(x[a:b], y[a:b]) > 80.0


def test_streaming_ola_bit_equals_batch():
    """Block-streamed OLA == one-shot OLA on the same frames."""
    rng = np.random.default_rng(4)
    t_total, frame_len, hop = 32, 512, 256
    frames = rng.standard_normal((t_total, frame_len)).astype(np.float32)
    full = helpers.run_planes(lambda fr: ola_mod.overlap_add(fr, hop),
                              frames)

    tail = np.zeros(frame_len - hop, np.float32)
    outs = []
    bs = 8
    for i in range(0, t_total, bs):
        out, tail = helpers.run_planes(
            lambda fr, tl: ola_mod.streaming_overlap_add(fr, hop, tl),
            frames[i:i + bs], tail)
        outs.append(out)
    streamed = np.concatenate(outs)
    np.testing.assert_allclose(streamed, full[:len(streamed)], atol=1e-6)
