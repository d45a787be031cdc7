"""ctypes bindings for the native host runtime (native/mcax_native.cpp).

The TPU-native analogue of the reference's wipp native tier, applied to the
*host* data path: streaming WAV block reads, PCM deinterleave/convert and an
SPSC ring buffer all run in C++ when ``libmcax_native.so`` is present
(``make -C native``), with pure-Python/NumPy fallbacks otherwise so the
framework never hard-depends on the native build.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_NAME = "libmcax_native.so"


def _find_lib() -> Optional[str]:
    env = os.environ.get("MCAX_NATIVE_LIB")
    if env and os.path.exists(env):
        return env
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    for cand in (os.path.join(here, "native", _LIB_NAME),
                 os.path.join(os.path.dirname(__file__), _LIB_NAME)):
        if os.path.exists(cand):
            return cand
    return None


def _load():
    path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    c_i16p = ctypes.POINTER(ctypes.c_int16)
    c_f32p = ctypes.POINTER(ctypes.c_float)
    lib.mcax_wav_open.restype = ctypes.c_void_p
    lib.mcax_wav_open.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_int32),
                                  ctypes.POINTER(ctypes.c_int32),
                                  ctypes.POINTER(ctypes.c_int64)]
    lib.mcax_wav_read_block.restype = ctypes.c_int64
    lib.mcax_wav_read_block.argtypes = [ctypes.c_void_p, c_f32p,
                                        ctypes.c_int64]
    lib.mcax_wav_close.argtypes = [ctypes.c_void_p]
    lib.mcax_f32_to_i16_interleave.argtypes = [c_f32p, c_i16p,
                                               ctypes.c_int64,
                                               ctypes.c_int32]
    lib.mcax_ring_create.restype = ctypes.c_void_p
    lib.mcax_ring_create.argtypes = [ctypes.c_int64, ctypes.c_int32]
    lib.mcax_ring_push.restype = ctypes.c_int32
    lib.mcax_ring_push.argtypes = [ctypes.c_void_p, c_f32p]
    lib.mcax_ring_pop.restype = ctypes.c_int32
    lib.mcax_ring_pop.argtypes = [ctypes.c_void_p, c_f32p]
    lib.mcax_ring_size.restype = ctypes.c_int32
    lib.mcax_ring_size.argtypes = [ctypes.c_void_p]
    lib.mcax_ring_destroy.argtypes = [ctypes.c_void_p]
    return lib


_lib = _load()


def available() -> bool:
    return _lib is not None


class NativeWavReader:
    """Streaming block reader over the C++ RIFF parser.

    Yields float32 [C, block_len] blocks (zero-padded final block), without
    ever materialising the whole file — the reference's block-feeding demo
    loop, minus the full-file scipy read.
    """

    def __init__(self, path: str, block_len: int):
        if _lib is None:
            raise RuntimeError("native library not available")
        ch = ctypes.c_int32()
        sr = ctypes.c_int32()
        nf = ctypes.c_int64()
        self._h = _lib.mcax_wav_open(path.encode(), ctypes.byref(ch),
                                     ctypes.byref(sr), ctypes.byref(nf))
        if not self._h:
            raise IOError(f"cannot open WAV {path!r}")
        self.channels = ch.value
        self.sample_rate = sr.value
        self.num_frames = nf.value
        self.block_len = block_len

    def read_block(self) -> Tuple[np.ndarray, int]:
        """→ (block [C, block_len] float32, frames_read). frames_read == 0
        at EOF."""
        out = np.empty((self.channels, self.block_len), np.float32)
        got = _lib.mcax_wav_read_block(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.block_len)
        return out, int(got)

    def __iter__(self):
        while True:
            blk, got = self.read_block()
            if got == 0:
                return
            yield blk

    def close(self):
        if getattr(self, "_h", None):
            _lib.mcax_wav_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class Ring:
    """SPSC ring of fixed-shape float32 blocks (native wipp-CircularBuffer
    analogue); used by the double-buffered feeder in mcax.io.stream."""

    def __init__(self, block_shape, capacity_blocks: int = 8):
        if _lib is None:
            raise RuntimeError("native library not available")
        self.block_shape = tuple(block_shape)
        self._n = int(np.prod(self.block_shape))
        self._h = _lib.mcax_ring_create(self._n, capacity_blocks)

    def push(self, block: np.ndarray) -> bool:
        b = np.ascontiguousarray(block, np.float32)
        assert b.shape == self.block_shape
        return bool(_lib.mcax_ring_push(
            self._h, b.ctypes.data_as(ctypes.POINTER(ctypes.c_float))))

    def pop(self) -> Optional[np.ndarray]:
        out = np.empty(self.block_shape, np.float32)
        ok = _lib.mcax_ring_pop(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out if ok else None

    def __len__(self) -> int:
        return int(_lib.mcax_ring_size(self._h))

    def close(self):
        if getattr(self, "_h", None):
            _lib.mcax_ring_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def f32_to_i16_interleaved(x: np.ndarray) -> np.ndarray:
    """[C, N] float32 → int16 interleaved [N, C] via the native kernel
    (NumPy fallback when the library is absent)."""
    c, n = x.shape
    if _lib is None:
        return (np.clip(x.T, -1.0, 1.0) * 32767.0).astype(np.int16)
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty((n, c), np.int16)
    _lib.mcax_f32_to_i16_interleave(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), n, c)
    return out
