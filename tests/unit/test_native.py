"""Native host runtime (C++ WAV reader / ring buffer) vs scipy oracle."""

import os
import subprocess

import numpy as np
import pytest

from mcax.io import native as nat
from mcax.io import stream as stream_mod
from mcax.io import wav as wav_io

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ensure_lib():
    if not nat.available():
        r = subprocess.run(["make", "-C", os.path.join(REPO, "native")],
                           capture_output=True)
        if r.returncode != 0:
            pytest.skip("native toolchain unavailable")
        nat._lib = nat._load()
        if nat._lib is None:
            pytest.skip("native library failed to load")


@pytest.fixture(scope="module", autouse=True)
def lib():
    _ensure_lib()


def _write(tmp, c=4, n=10000, rate=16000, dtype=np.int16):
    rng = np.random.default_rng(0)
    x = (rng.uniform(-0.9, 0.9, (c, n))).astype(np.float32)
    path = os.path.join(tmp, "t.wav")
    wav_io.write_wav(path, rate, x, dtype=dtype)
    return path, x


@pytest.mark.parametrize("dtype", [np.int16, np.float32, "int24"])
def test_native_reader_matches_scipy(tmp_path, dtype):
    path, _ = _write(str(tmp_path), dtype=dtype)
    _, want = wav_io.read_wav(path)
    r = nat.NativeWavReader(path, 4096)
    assert (r.channels, r.sample_rate, r.num_frames) == (4, 16000, 10000)
    got = np.concatenate(list(r), axis=-1)[:, :10000]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_int24_roundtrip_exact(tmp_path):
    """24-bit PCM write → read is exact at the 2^-23 quantisation grid,
    through BOTH readers (scipy fallback and the native parser)."""
    path = os.path.join(str(tmp_path), "i24.wav")
    codes = np.array([[0, 1, -1, 8388607, -8388608, 4242424, -4242424,
                       256, -256]], np.int64)
    x = (codes / 8388607.0).astype(np.float32)     # exactly representable
    x = np.clip(x, -1.0, 1.0)
    wav_io.write_wav(path, 16000, x, dtype="int24")
    _, via_scipy = wav_io.read_wav(path)
    r = nat.NativeWavReader(path, 16)
    blk, got = r.read_block()
    r.close()
    assert got == codes.shape[1]
    want = np.clip(codes, -8388608, 8388607) / 8388608.0
    np.testing.assert_allclose(blk[:, :got], want, atol=2e-7)
    np.testing.assert_allclose(via_scipy, want, atol=2e-7)


def test_native_reader_pads_final_block(tmp_path):
    path, _ = _write(str(tmp_path), n=5000)
    blocks = list(nat.NativeWavReader(path, 4096))
    assert len(blocks) == 2
    assert np.all(blocks[1][:, 5000 - 4096:] == 0.0)


def test_block_iterator_fallback_parity(tmp_path, monkeypatch):
    path, _ = _write(str(tmp_path))
    native_blocks = list(stream_mod.block_iterator(path, 4096))
    monkeypatch.setattr(nat, "_lib", None)
    py_blocks = list(stream_mod.block_iterator(path, 4096))
    assert len(native_blocks) == len(py_blocks)
    for a, b in zip(native_blocks, py_blocks):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_ring_roundtrip():
    ring = nat.Ring((2, 64), capacity_blocks=3)
    blocks = [np.full((2, 64), i, np.float32) for i in range(5)]
    assert ring.push(blocks[0]) and ring.push(blocks[1]) and ring.push(blocks[2])
    assert not ring.push(blocks[3])          # full
    assert len(ring) == 3
    got = ring.pop()
    np.testing.assert_array_equal(got, blocks[0])
    assert ring.push(blocks[3])
    for want in blocks[1:4]:
        np.testing.assert_array_equal(ring.pop(), want)
    assert ring.pop() is None                # empty


def test_prefetched_preserves_order(tmp_path):
    path, _ = _write(str(tmp_path), n=40000)
    direct = list(stream_mod.block_iterator(path, 4096))
    pre = list(stream_mod.prefetched(stream_mod.block_iterator(path, 4096)))
    assert len(direct) == len(pre)
    for a, b in zip(direct, pre):
        np.testing.assert_array_equal(a, b)


def test_f32_to_i16_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.uniform(-1.2, 1.2, (3, 1000)).astype(np.float32)
    got = nat.f32_to_i16_interleaved(x)
    want = (np.clip(x.T, -1.0, 1.0) * 32767.0).astype(np.int16)
    np.testing.assert_array_equal(got, want)
