"""Round benchmark: 8-mic SRP-PHAT + MVDR throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/s", "vs_baseline": N}

The metric is BASELINE.json's primary: multichannel samples/s/chip for the
config-4 chain (8-mic circular, 48 kHz, SRP-PHAT steering + recursive-
covariance MVDR + OLA resynthesis).  Baseline = the driver-set target of
10x real-time at 48 kHz = 480_000 samples/s/chip (BASELINE.md — the
reference publishes no numbers), so vs_baseline > 1.0 beats the target.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np


def main() -> None:
    from mcax.config import get_config
    from mcax.pipeline import Pipeline

    cfg = get_config("config4")
    pipe = Pipeline(cfg)
    rng = np.random.default_rng(0)
    batch = 32                               # blocks per dispatch (lax.scan)
    blocks = jax.device_put(rng.standard_normal(
        (batch, pipe.geom.num_mics, cfg.block_len)).astype(np.float32))

    state = pipe.init_state()
    state, out = pipe.process_blocks(state, blocks)    # compile + warmup
    jax.block_until_ready(out)

    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        state, out = pipe.process_blocks(state, blocks)
    jax.block_until_ready((state, out))
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
