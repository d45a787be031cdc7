"""Streaming pipeline state (SURVEY.md §5 checkpoint/resume, §7.1).

The reference keeps streaming state in mutable C++ objects (dspone circular
buffers, covariance members, tracker internals) with no serialization.  mcax
makes ALL of it one explicit pytree threaded through ``process_block`` —
which is what makes the pipeline jit-donatable, checkpointable (np.savez of
the leaves + config hash) and resumable bit-identically.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from mcax.algos.particle import ParticleState
from mcax.algos.tracking import TrackState


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PipelineState:
    carry: jnp.ndarray                    # [C, frame_len - hop] input carry
    block_idx: jnp.ndarray                # scalar int32
    ola_tail: Optional[jnp.ndarray] = None   # [(S,) frame_len - hop] OLA carry
    cov: Optional[jnp.ndarray] = None        # [F, C, C, 2] float32 re/im
                                             # planes (complex is internal-
                                             # only; covariance.from_planes)
    tracks: Optional[TrackState] = None
    particles: Optional[ParticleState] = None   # particle smoother clouds
                                                # (incl. their PRNG key)
