"""Double-buffered streaming block feeder (SURVEY.md §7.4 "streaming
throughput": keep the block loop free of host round-trips).

A producer thread reads WAV blocks (native C++ reader when built, scipy
fallback) into a ring buffer while the consumer drives the TPU pipeline, so
disk I/O and PCM conversion overlap device compute.  Falls back to a plain
synchronous iterator when threading is unnecessary (small files).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

from mcax.io import native as nat
from mcax.io import wav as wav_io


def block_iterator(path: str, block_len: int,
                   expected_channels: Optional[int] = None
                   ) -> Iterator[np.ndarray]:
    """Sequential [C, block_len] float32 blocks of a WAV file (zero-padded
    final block).  Uses the native streaming reader when available."""
    if nat.available():
        with nat.NativeWavReader(path, block_len) as r:
            if expected_channels is not None and r.channels != expected_channels:
                raise ValueError(f"{path}: {r.channels} channels, "
                                 f"expected {expected_channels}")
            yield from r
        return
    _, samples = wav_io.read_wav(path)
    c, n = samples.shape
    if expected_channels is not None and c != expected_channels:
        raise ValueError(f"{path}: {c} channels, expected {expected_channels}")
    nblocks = -(-n // block_len)
    for b in range(nblocks):
        blk = samples[:, b * block_len:(b + 1) * block_len]
        if blk.shape[1] < block_len:
            blk = np.pad(blk, ((0, 0), (0, block_len - blk.shape[1])))
        yield blk


def prefetched(blocks: Iterator[np.ndarray], depth: int = 4
               ) -> Iterator[np.ndarray]:
    """Run the block source on a producer thread, `depth` blocks ahead."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _SENTINEL = object()
    err: list = []

    def produce():
        try:
            for b in blocks:
                q.put(b)
        except BaseException as e:      # surfaced on the consumer side
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
