"""Throughput-mode serving: B consecutive blocks per device dispatch.

The mcax equivalent of batch/offline processing with the reference —
except the reference's per-frame virtual-method loop has no batched
analogue; this is where the TPU-first design pays (SURVEY.md §7.4 and
the PERF.md headline: the config-4 chain runs hundreds of times faster
than real time per chip in this mode).

Demonstrates the production serving recipe:
  * ``process_blocks`` — framing/DFT/CPS/SRP/MVDR over all B*T frames
    as one fused dispatch, streaming state threaded between dispatches,
  * fenced timing — the clock stops only after fetching a real scalar
    derived from the output (on some TPU runtimes ``block_until_ready``
    does not actually wait; PERF.md "measurement hazards"),
  * per-dispatch DOA + audio access from the batched output dict.

    python examples/throughput.py [batch_blocks] [n_dispatches]
"""

import sys
import time

import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))   # runnable as `python examples/<x>.py`

from mcax.config import get_config
from mcax.pipeline import Pipeline


def main(batch: int = 32, dispatches: int = 4, config: str = "config4"):
    cfg = get_config(config)
    pipe = Pipeline(cfg)
    geom = cfg.geometry()
    rng = np.random.default_rng(0)

    # ONE device-resident batch, reused per dispatch (generating fresh
    # random audio on the host every dispatch would measure numpy + the
    # host->device copy, not the chain; dispatches still chain through
    # the streaming state so the device cannot elide them)
    import jax

    blocks = jax.device_put(rng.standard_normal(
        (batch, geom.num_mics, cfg.block_len)).astype(np.float32))

    def next_batch():
        return blocks

    def fence(outs):
        # fetch a real scalar the computation must finish to produce
        key = "audio" if "audio" in outs else sorted(outs)[0]
        return float(np.asarray(outs[key]).ravel()[-1])

    state = pipe.init_state()
    # compile + warm-up dispatch (excluded from timing)
    state, outs = pipe.process_blocks(state, next_batch())
    fence(outs)

    total = 0
    t0 = time.perf_counter()
    for _ in range(dispatches):
        state, outs = pipe.process_blocks(state, next_batch())
        total += batch * cfg.block_len
    last = fence(outs)
    dt = time.perf_counter() - t0
    assert np.isfinite(last)
    sps = total / dt
    rt = sps / cfg.sample_rate
    print(f"{config}: {batch} blocks/dispatch x {dispatches} dispatches "
          f"-> {sps / 1e6:.1f} M samples/s ({rt:.0f}x real-time)")
    return sps


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    nd = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    main(batch, nd)
