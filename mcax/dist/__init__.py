"""Distributed layer (components C13/C14, SURVEY.md §2a).

The reference stack is a single-process C++ library with no distributed
runtime at all (no MPI/NCCL — SURVEY.md §2a C13); scaling out is a new,
TPU-native capability: a 2-axis ``('time', 'channel')`` device mesh where

  * ``time``    — sequence/context parallelism over frame blocks, with
                  overlap-save halo exchange between neighbors (halo.py),
  * ``channel`` — tensor parallelism over microphones / mic pairs / bins,
                  reduced with psum / all_gather (sharded.py),

and an exact exponential-recursion combine for the spatial covariance across
time shards (scan.py).  Everything is shard_map + XLA collectives riding ICI.
"""

from mcax.dist import mesh as mesh
from mcax.dist import halo as halo
from mcax.dist import scan as scan
from mcax.dist.sharded import ShardedPipeline as ShardedPipeline
