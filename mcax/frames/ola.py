"""Overlap-add resynthesis (component C10, SURVEY.md §2a).

The reference accumulates each synthesised frame into an output circular
buffer inside dspone's ShortTimeProcess (wipp add kernels).  Here a whole
block of synthesis frames is overlap-added in one vectorised step: when the
frame length is a multiple of the hop (every shipped config), the T frames are
reshaped to [T, L/hop, hop] and summed as L/hop shifted slabs — no scatter.

Streaming across blocks carries an explicit ``tail`` of (L - hop) samples in
the pipeline state pytree, replacing the reference's mutable buffer object.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """[..., T, L] → [..., (T-1)*hop + L] overlap-added signal."""
    *lead, t, frame_len = frames.shape
    if frame_len % hop == 0:
        k = frame_len // hop
        slabs = frames.reshape(*lead, t, k, hop)
        out = jnp.zeros((*lead, t + k - 1, hop), frames.dtype)
        for j in range(k):
            out = out.at[..., j:j + t, :].add(slabs[..., :, j, :])
        return out.reshape(*lead, (t + k - 1) * hop)
    # General hop: scatter-add (static indices).
    out_len = (t - 1) * hop + frame_len
    idx = (jnp.arange(t)[:, None] * hop + jnp.arange(frame_len)[None, :]).reshape(-1)
    return (jnp.zeros((*lead, out_len), frames.dtype)
            .at[..., idx].add(frames.reshape(*lead, t * frame_len)))


def streaming_overlap_add(frames: jnp.ndarray, hop: int,
                          tail: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One block of streaming OLA.

    Args:
      frames: synthesis frames [..., T, L] of the current block.
      hop: frame advance.
      tail: carried overlap from the previous block, [..., L - hop].
    Returns:
      (out, new_tail): ``out`` is the T*hop finished samples of this block
      (bit-identical to the corresponding slice of a non-streaming OLA over
      the concatenated signal); ``new_tail`` is the next carry.
    """
    t, frame_len = frames.shape[-2], frames.shape[-1]
    full = overlap_add(frames, hop)                       # [..., (T-1)*hop + L]
    full = full.at[..., : frame_len - hop].add(tail)
    out = full[..., : t * hop]
    new_tail = full[..., t * hop:]
    return out, new_tail
