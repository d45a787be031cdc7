"""Kernel backend selection.

The reference's wipp layer selects an Intel IPP backend or a generic C
fallback at build time; mcax selects per-process between:

  * ``pallas`` — hand-written Pallas TPU kernels (the native tier of
    SURVEY.md §2a: FFT, CPS+PHAT, steering matmul run on MXU/VPU).
  * ``xla``    — pure jnp implementations (CPU CI, interpret-mode oracle,
    and the correctness fallback everywhere).

Selection: the ``MCAX_BACKEND`` env var (``pallas`` | ``xla`` | ``auto``),
default ``auto`` = pallas on TPU-like platforms, xla elsewhere.
"""

from __future__ import annotations

import functools
import os

import jax

_TPU_PLATFORMS = ("tpu", "axon")


@functools.lru_cache(maxsize=None)
def _auto_backend() -> str:
    try:
        plat = jax.default_backend()
    except Exception:
        return "xla"
    return "pallas" if plat in _TPU_PLATFORMS else "xla"


def get_backend() -> str:
    b = os.environ.get("MCAX_BACKEND", "auto").lower()
    if b == "auto":
        return _auto_backend()
    if b not in ("pallas", "xla"):
        raise ValueError(f"MCAX_BACKEND must be pallas|xla|auto, got {b!r}")
    return b


def use_pallas() -> bool:
    return get_backend() == "pallas"


def interpret_mode() -> bool:
    """Run Pallas kernels in interpreter mode (CPU CI / debugging)."""
    return os.environ.get("MCAX_PALLAS_INTERPRET", "0") == "1"
