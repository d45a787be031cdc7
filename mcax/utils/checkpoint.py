"""Checkpoint / resume of streaming pipeline state (SURVEY.md §5).

The reference has no serialization at all (stateful C++ objects); mcax's
entire streaming state is one pytree, so preemption-safe resume is a plain
``np.savez`` of the leaves plus the config hash and sample cursor.  Resume
is bit-identical to an uninterrupted run (tests/unit/test_pipeline.py)
because the state pytree *is* the complete cross-block memory.
"""

from __future__ import annotations

import dataclasses
import json
import os
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

FORMAT_VERSION = 1


def save(path: str, state: Any, config_hash: str,
         sample_cursor: int = 0, extra: Optional[Dict[str, Any]] = None) -> None:
    """Atomically write the state pytree + metadata to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    payload["__meta__"] = np.frombuffer(json.dumps({
        "version": FORMAT_VERSION,
        "config_hash": config_hash,
        "sample_cursor": int(sample_cursor),
        "num_leaves": len(leaves),
        "extra": extra or {},
    }).encode(), dtype=np.uint8)
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load(path: str, state_like: Any,
         config_hash: Optional[str] = None) -> Tuple[Any, int, Dict[str, Any]]:
    """Load a checkpoint into the structure of ``state_like``.

    Returns (state, sample_cursor, extra).  Raises if the stored config hash
    mismatches ``config_hash`` (resuming under a different config would
    silently corrupt the stream).
    """
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        if meta["version"] != FORMAT_VERSION:
            raise ValueError(f"checkpoint version {meta['version']} != "
                             f"{FORMAT_VERSION}")
        if config_hash is not None and meta["config_hash"] != config_hash:
            raise ValueError(
                f"checkpoint config hash {meta['config_hash']} does not match "
                f"current config {config_hash}; refusing to resume")
        leaves_like, treedef = jax.tree_util.tree_flatten(state_like)
        if meta["num_leaves"] != len(leaves_like):
            raise ValueError("checkpoint state structure mismatch")
        leaves = [jax.numpy.asarray(z[f"leaf_{i}"])
                  for i in range(meta["num_leaves"])]
    return (jax.tree_util.tree_unflatten(treedef, leaves),
            meta["sample_cursor"], meta["extra"])
