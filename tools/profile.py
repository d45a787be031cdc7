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
    ap.add_argument("--batched", type=int, default=0, metavar="B",
                    help="profile the throughput mode: B blocks per "
                         "process_blocks dispatch (the headline path), "
                         "--blocks dispatches inside the trace")
    ap.add_argument("--out", default="/tmp/mcax-trace")
    args = ap.parse_args(argv)

    from mcax.config import get_config
    from mcax.pipeline import Pipeline

    cfg = get_config(args.config)
    pipe = Pipeline(cfg, donate=False)
    rng = np.random.default_rng(0)
    state = pipe.init_state()
    if args.batched:
        batch = jax.device_put(rng.standard_normal(
            (args.batched, pipe.geom.num_mics,
             cfg.block_len)).astype(np.float32))
        step = lambda st: pipe.process_blocks(st, batch)
    else:
        block = jax.device_put(rng.standard_normal(
            (pipe.geom.num_mics, cfg.block_len)).astype(np.float32))
        step = lambda st: pipe.process_block(st, block)
    for _ in range(3):
        state, out = step(state)                 # compile/warm outside trace
    jax.block_until_ready(out)

    with jax.profiler.trace(args.out):
        for _ in range(args.blocks):
            state, out = step(state)
        jax.block_until_ready((state, out))
        # block_until_ready can return early on the tunneled backend; a
        # real-scalar fetch is the only sound fence there
        float(jax.numpy.sum(out[next(iter(out))]))
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
