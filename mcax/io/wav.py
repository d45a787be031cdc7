"""Multichannel WAV read/write (component C12, SURVEY.md §2a).

The reference's demo/test binaries read multichannel PCM WAV and feed
fixed-size blocks through the modules; mcax does the same with
scipy.io.wavfile (no soundfile in this environment).  Samples are float32 in
[-1, 1] internally, shaped channels-first [C, N] to match the pipeline.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy.io import wavfile

_INT_SCALE = {np.dtype(np.int16): 32768.0,
              np.dtype(np.int32): 2147483648.0,
              np.dtype(np.uint8): 128.0}


def wav_info(path: str) -> Tuple[int, int, int]:
    """(sample_rate, num_frames, channels) without reading the payload.
    Uses the native header parser when built; falls back to a full read."""
    from mcax.io import native as nat
    if nat.available():
        r = nat.NativeWavReader(path, 1)
        try:
            return r.sample_rate, r.num_frames, r.channels
        finally:
            r.close()
    rate, data = read_wav(path)
    return rate, data.shape[1], data.shape[0]


def read_wav(path: str) -> Tuple[int, np.ndarray]:
    """Read a WAV file → (sample_rate, float32 samples [C, N] in [-1, 1]).

    Handles 16/24/32-bit PCM, IEEE float32 and uint8.  24-bit PCM (common on
    multichannel recorders) arrives from scipy as int32 with the payload in
    the top 3 bytes, so the int32 scale divides out exactly.
    """
    rate, data = wavfile.read(path)
    if data.ndim == 1:
        data = data[:, None]
    dt = data.dtype
    if dt in _INT_SCALE:
        if dt == np.dtype(np.uint8):
            data = (data.astype(np.float32) - 128.0) / 128.0
        else:
            data = data.astype(np.float32) / _INT_SCALE[dt]
    else:
        data = data.astype(np.float32)
    return int(rate), np.ascontiguousarray(data.T)


def write_wav(path: str, sample_rate: int, samples: np.ndarray,
              dtype=np.int16) -> None:
    """Write float32 [C, N] (or [N]) samples in [-1, 1] to a PCM WAV.

    ``dtype``: np.int16, np.float32, or the string "int24" (packed 24-bit
    PCM — scipy cannot write it, so the RIFF is emitted directly)."""
    x = np.asarray(samples, dtype=np.float32)
    if x.ndim == 2:
        x = x.T                                    # scipy wants [N, C]
    else:
        x = x[:, None]
    x = np.clip(x, -1.0, 1.0)
    if dtype == "int24":
        _write_wav_int24(path, sample_rate, x)
        return
    if dtype == np.int16:
        out = (x * 32767.0).astype(np.int16)
    elif dtype == np.float32:
        out = x
    else:
        raise ValueError(f"unsupported dtype {dtype}")
    wavfile.write(path, sample_rate, out)


def _write_wav_int24(path: str, sample_rate: int, x: np.ndarray) -> None:
    """Emit packed little-endian 24-bit PCM ([N, C] float32 in [-1, 1])."""
    import struct
    n, c = x.shape
    vals = np.round(x * 8388607.0).astype(np.int32)        # 2^23 - 1
    le = vals.astype("<i4").tobytes()                      # 4-byte LE words
    b = np.frombuffer(le, np.uint8).reshape(-1, 4)
    data = np.ascontiguousarray(b[:, :3]).tobytes()        # drop the MSB
    bps = c * 3
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, c, sample_rate,
                                      sample_rate * bps, bps, 24))
        f.write(b"data" + struct.pack("<I", len(data)))
        f.write(data)
        if len(data) % 2:
            f.write(b"\x00")
