"""Profiler hook (SURVEY.md §5 tracing): wraps a pipeline run in
jax.profiler.trace so the block loop can be inspected in TensorBoard/Perfetto.

    python tools/profile.py --config config4 --blocks 20 --out /tmp/mcax-trace
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import jax
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="config4")
    ap.add_argument("--blocks", type=int, default=20)
    ap.add_argument("--out", default="/tmp/mcax-trace")
    args = ap.parse_args(argv)

    from mcax.config import get_config
    from mcax.pipeline import Pipeline

    cfg = get_config(args.config)
    pipe = Pipeline(cfg)
    rng = np.random.default_rng(0)
    block = jax.device_put(rng.standard_normal(
        (pipe.geom.num_mics, cfg.block_len)).astype(np.float32))
    state = pipe.init_state()
    state, out = pipe.process_block(state, block)        # compile outside trace
    jax.block_until_ready(out)

    with jax.profiler.trace(args.out):
        for _ in range(args.blocks):
            state, out = pipe.process_block(state, block)
        jax.block_until_ready((state, out))
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
