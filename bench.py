"""Round benchmark: 8-mic SRP-PHAT + MVDR throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/s", "vs_baseline": N}

The metric is BASELINE.json's primary: multichannel samples/s/chip for the
config-4 chain (8-mic circular, 48 kHz, SRP-PHAT steering + recursive-
covariance MVDR + OLA resynthesis).  Baseline = the driver-set target of
10x real-time at 48 kHz = 480_000 samples/s/chip (BASELINE.md — the
reference publishes no numbers), so vs_baseline > 1.0 beats the target.

Timing is fenced: iterations chain through the streaming state pytree (so
the device cannot overlap or elide them) and the clock stops only after a
device->host fetch of a real scalar from the final state/output — on the
tunneled TPU backend ``block_until_ready`` neither waits nor surfaces
runtime errors, so naive loops would measure dispatch rate, not compute
(see tools/bench.py).  The fetched values are also checked finite, so a
poisoned run cannot report a number.
"""

from __future__ import annotations

import json
import math
import time

import jax
import jax.numpy as jnp
import numpy as np


def _fence(tree) -> float:
    """Fetch one real scalar from the tree: a true execution barrier."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if not jnp.iscomplexobj(leaf):
            v = float(jnp.asarray(leaf).ravel()[0])
            if not math.isfinite(v):
                raise RuntimeError(f"non-finite bench output: {v}")
            return v
    raise ValueError("no real leaf to fence on")


def main() -> None:
    from mcax.config import get_config
    from mcax.pipeline import Pipeline

    cfg = get_config("config4")
    pipe = Pipeline(cfg)
    rng = np.random.default_rng(0)
    batch = 64     # blocks per dispatch (lax.scan): 32 still leaves the
                   # dispatch overhead visible on the tunneled backend
                   # (1.73 ms/block); 64 saturates at ~0.30 ms/block and
                   # 128/256 gain nothing further (PERF.md)
    blocks = jax.device_put(rng.standard_normal(
        (batch, pipe.geom.num_mics, cfg.block_len)).astype(np.float32))

    state = pipe.init_state()
    state, out = pipe.process_blocks(state, blocks)    # compile + warmup
    _fence(out)

    iters = 16
    t0 = time.perf_counter()
    for _ in range(iters):
        state, out = pipe.process_blocks(state, blocks)
    _fence(out)
    _fence(state)
    dt = time.perf_counter() - t0

    samples_per_s = iters * batch * cfg.block_len / dt
    baseline = 10.0 * cfg.sample_rate       # 10x real-time target
    print(json.dumps({
        "metric": "samples_per_s_per_chip_8mic_srp_phat_mvdr_48k",
        "value": round(samples_per_s, 1),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_s / baseline, 3),
    }))


if __name__ == "__main__":
    main()
