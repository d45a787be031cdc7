"""Overlap-save halo exchange between time shards (C13, SURVEY.md §3.5).

Each time shard's framing needs the last ``frame_len - hop`` samples of its
left neighbor (the streaming carry for shard 0) — the ring-attention-style
neighbor exchange of SURVEY.md §2a, realised as a single ``ppermute`` per
block.  The symmetric synthesis-side exchange sends each shard's overlap-add
spill *rightward* so hop-aligned output shards stay exact.

These run inside ``shard_map``; the ``axis`` argument names the mesh axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from mcax.dist.mesh import TIME_AXIS


def _shift_right_perm(n: int):
    """Permutation sending shard i's payload to shard i+1 (open chain)."""
    return [(i, i + 1) for i in range(n - 1)]


def _push_right(payload: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Send payload one shard rightward; returns the left neighbor's.

    Implementation picked by MCAX_HALO (halo_rdma.halo_impl): the default
    ``ppermute`` open chain (zeros into shard 0), or the Pallas async
    remote-DMA ring (``rdma`` — shard 0 receives shard n-1's payload,
    which every caller overwrites with carry state, so the two agree)."""
    from mcax.dist import halo_rdma
    if halo_rdma.halo_impl() == "rdma":
        return halo_rdma.ring_push_right(payload, axis)
    n = lax.axis_size(axis)
    return lax.ppermute(payload, axis, _shift_right_perm(n))


def _recv_left(samples_local: jnp.ndarray, halo_len: int,
               carry_replicated: jnp.ndarray, axis: str) -> jnp.ndarray:
    """The halo-receive protocol: push this shard's tail rightward, take
    the left neighbor's, and overwrite shard 0's with the streaming carry
    (the contract both the ppermute chain and the rdma ring rely on).
    Callers guarantee axis_size > 1."""
    tail = samples_local[..., -halo_len:]
    recv = _push_right(tail, axis)         # shard 0's recv is overwritten
    idx = lax.axis_index(axis)
    return jnp.where(idx == 0, carry_replicated, recv)


def left_halo(samples_local: jnp.ndarray, halo_len: int,
              carry_replicated: jnp.ndarray,
              axis: str = TIME_AXIS) -> jnp.ndarray:
    """Prepend each time shard's left halo to its local samples.

    Args:
      samples_local: [..., N_local] this shard's samples.
      halo_len: frame_len - hop.
      carry_replicated: [..., halo_len] the streaming carry (previous block's
        tail), replicated; consumed by shard 0 only.
    Returns:
      [..., halo_len + N_local] halo-extended local samples.
    """
    n = lax.axis_size(axis)
    if n == 1:
        return jnp.concatenate([carry_replicated, samples_local], axis=-1)
    left = _recv_left(samples_local, halo_len, carry_replicated, axis)
    return jnp.concatenate([left, samples_local], axis=-1)


def stft_left_halo(samples_local: jnp.ndarray, halo_len: int,
                   carry_replicated: jnp.ndarray, window, hop: int,
                   axis: str = TIME_AXIS) -> jnp.ndarray:
    """Halo exchange + STFT with comm/compute OVERLAP (SURVEY.md §5).

    ``left_halo`` followed by a monolithic ``stft`` makes EVERY frame's
    DFT data-depend on the ppermute, so XLA must finish the collective
    before any compute starts.  Here only the first ``ceil(halo/hop)``
    frames (one frame at 50% overlap) consume the received halo; the
    remaining T-1 interior frames are transformed from purely local
    samples with no data dependency on the exchange.  XLA's TPU scheduler
    decomposes the ppermute into collective-permute-{start,done} and
    hoists the interior framing+DFT matmuls between them, hiding the halo
    latency behind ~(T-1)/T of the block's analysis FLOPs (VERDICT
    round-2 missing item 3; the measured window is in PERF.md).

    Frame math is per-row identical to the monolithic path, so outputs
    are bit-identical (pinned by tests/dist/test_primitives.py).

    Returns complex64 spectra [..., T, F] for the halo-extended signal.
    """
    from mcax.frames import stft as stft_mod
    n = lax.axis_size(axis)
    frame_len = int(window.shape[0])
    if n == 1:
        x = jnp.concatenate([carry_replicated, samples_local], axis=-1)
        return stft_mod.stft(x, window, hop)
    left = _recv_left(samples_local, halo_len, carry_replicated, axis)
    n_halo = -(-halo_len // hop)               # frames touching the halo
    off = n_halo * hop - halo_len              # first interior frame start
    interior = stft_mod.stft(samples_local[..., off:], window, hop)
    head_len = (n_halo - 1) * hop + frame_len - halo_len
    head_sig = jnp.concatenate([left, samples_local[..., :head_len]],
                               axis=-1)
    head = stft_mod.stft(head_sig, window, hop)
    return jnp.concatenate([head, interior], axis=-2)


def ola_tail_exchange(full_local: jnp.ndarray, out_len: int,
                      state_tail: jnp.ndarray,
                      axis: str = TIME_AXIS):
    """Cross-shard overlap-add spill exchange (synthesis side).

    Each shard overlap-adds its own frames into ``full_local`` of length
    ``out_len + spill`` where spill = frame_len - hop; the spill belongs at
    the head of the *right* neighbor's output region.  Requires
    spill <= out_len (i.e. frames_per_shard >= frame_len/hop - 1) so the
    spill never crosses more than one shard — asserted by the caller.

    Args:
      full_local: [..., out_len + spill] local overlap-add result.
      out_len: hop-aligned output samples owned by this shard.
      state_tail: [..., spill] streaming OLA tail from the previous block
        (replicated; consumed by shard 0).
    Returns:
      (out_local [..., out_len], new_tail [..., spill]) — new_tail is the
      LAST shard's spill, replicated over the axis via psum-masking.
    """
    n = lax.axis_size(axis)
    spill = full_local.shape[-1] - out_len
    tail_out = full_local[..., out_len:]
    if n == 1:
        out = full_local[..., :out_len].at[..., :spill].add(state_tail)
        return out, tail_out
    idx = lax.axis_index(axis)
    recv = _push_right(tail_out, axis)
    incoming = jnp.where(idx == 0, state_tail, recv)
    out = full_local[..., :out_len].at[..., :spill].add(incoming)
    # replicate the last shard's spill as the next block's streaming tail
    new_tail = lax.psum(jnp.where(idx == n - 1, tail_out,
                                  jnp.zeros_like(tail_out)), axis)
    return out, new_tail


def collect_last(x_local: jnp.ndarray, axis: str = TIME_AXIS) -> jnp.ndarray:
    """Replicate the last shard's value over the axis (for carry state)."""
    n = lax.axis_size(axis)
    if n == 1:
        return x_local
    idx = lax.axis_index(axis)
    return lax.psum(jnp.where(idx == n - 1, x_local, jnp.zeros_like(x_local)),
                    axis)
