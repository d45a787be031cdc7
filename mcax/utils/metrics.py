"""Per-block metrics + logging (SURVEY.md §5 observability).

The reference logs to stderr via a macro logger and delivers localisation
results through a user callback; mcax emits a JSONL metrics stream (block
latency, real-time factor, DOA, peak power) and a DOA CSV — the callback
equivalent a downstream consumer can tail.
"""

from __future__ import annotations

import json
import logging
import time
from typing import Any, Dict, IO, Optional

log = logging.getLogger("mcax")


class JsonlWriter:
    """Append-only JSONL metrics sink (one dict per block)."""

    def __init__(self, path: Optional[str]):
        self._f: Optional[IO[str]] = open(path, "a") if path else None

    def write(self, record: Dict[str, Any]) -> None:
        if self._f is None:
            return
        self._f.write(json.dumps(record, default=float) + "\n")

    def close(self) -> None:
        if self._f is not None:
            self._f.flush()
            self._f.close()
            self._f = None


class BlockTimer:
    """Tracks block wall-times and real-time factor."""

    def __init__(self, sample_rate: float, block_len: int):
        self.sample_rate = sample_rate
        self.block_len = block_len
        self._t0 = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        audio_s = self.block_len / self.sample_rate
        self.realtime_factor = audio_s / self.elapsed if self.elapsed > 0 else 0.0
        return False
