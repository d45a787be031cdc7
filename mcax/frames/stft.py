"""Framing and short-time Fourier analysis (component C2/C3 glue).

The reference's dspone ShortTimeProcess consumes a circular buffer one frame
at a time (window → wipp_fft → virtual per-frame hook).  TPU-natively, a whole
block of audio is framed into a single batched tensor ``[..., T, L]`` and one
jitted call transforms every frame at once — the per-frame virtual-method hot
loop (SURVEY.md §3.1) becomes one batched matmul-form rFFT on the MXU.

Frame extraction uses a static gather index (block length, frame length and
hop are all compile-time constants), so XLA sees fully static shapes.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from mcax.kernels import fft as kfft


def num_frames(block_len: int, frame_len: int, hop: int) -> int:
    """Number of complete frames in a block (no padding; tail samples remain
    in the streaming input buffer, matching the reference's circular-buffer
    semantics of only processing complete frames)."""
    if block_len < frame_len:
        return 0
    return (block_len - frame_len) // hop + 1


@functools.lru_cache(maxsize=None)
def _frame_indices(block_len: int, frame_len: int, hop: int) -> np.ndarray:
    t = num_frames(block_len, frame_len, hop)
    return (np.arange(t)[:, None] * hop + np.arange(frame_len)[None, :]).astype(np.int32)


def frame_signal(x: jnp.ndarray, frame_len: int, hop: int) -> jnp.ndarray:
    """[..., N] → [..., T, frame_len] framing.

    When the hop divides the frame length (every shipped config), frames are
    assembled from k = frame_len/hop contiguous hop-sized slabs — k shifted
    slice views concatenated on the last axis.  That is pure contiguous
    copying, much cheaper on TPU than the strided-gather fallback (a gather
    of T×frame_len indices), which remains for general (hop, frame) pairs.
    """
    t = num_frames(x.shape[-1], frame_len, hop)
    if frame_len % hop == 0 and t > 0:
        k = frame_len // hop
        nslab = x.shape[-1] // hop
        slabs = x[..., : nslab * hop].reshape(*x.shape[:-1], nslab, hop)
        parts = [slabs[..., j:j + t, :] for j in range(k)]
        return jnp.concatenate(parts, axis=-1)
    idx = _frame_indices(x.shape[-1], frame_len, hop)
    return x[..., idx]


def stft(x: jnp.ndarray, window: np.ndarray, hop: int) -> jnp.ndarray:
    """Windowed short-time spectra of a block.

    Args:
      x: real samples [..., N] (typically [C, N]).
      window: analysis window [L] (host constant).
      hop: frame advance in samples.
    Returns:
      complex64 spectra [..., T, F] with F = L//2 + 1.

    The analysis window is folded into the DFT matrix on matmul-DFT
    backends (kernels.fft.rfft window parameter) — no separate multiply
    pass over the frame tensor.  At the ratio-2 overlap (frame = 2*hop,
    every shipped config) the TPU default is the single-pass fused
    framing+DFT Pallas kernel (kernels/stft_fused.py, MCAX_STFT knob):
    the slab tensor is read once and spectra planes are emitted
    directly, skipping both materialised frame halves.
    """
    import jax

    from mcax.kernels import dispatch as _dispatch

    n = int(window.shape[0])
    t = num_frames(x.shape[-1], n, hop)
    if (n == 2 * hop and t > 0 and x.shape[-1] % hop == 0
            and _dispatch.stft_backend() == "fused"):
        from mcax.kernels import stft_fused as _sf

        re, im = _sf.stft_fused_planes(x, window, hop)
        return jax.lax.complex(re, im)
    frames = frame_signal(x, n, hop)
    return kfft.rfft(frames, window=window)


def istft_frames(spectra: jnp.ndarray, window: np.ndarray) -> jnp.ndarray:
    """Inverse transform + synthesis windowing; OLA is a separate stage.

    [..., T, F] complex → [..., T, L] real, each frame multiplied by the
    synthesis window (folded into the inverse-DFT matrix on matmul
    backends).  Overlap-add (mcax.frames.ola) completes resynthesis.
    """
    frame_len = int(window.shape[0])
    return kfft.irfft(spectra, frame_len, window=window)
