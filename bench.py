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
    nbuf = 8
    blocks = [jax.device_put(rng.standard_normal(
        (pipe.geom.num_mics, cfg.block_len)).astype(np.float32))
        for _ in range(nbuf)]

    state = pipe.init_state()
    for b in range(3):                       # compile + warmup
        state, out = pipe.process_block(state, blocks[b % nbuf])
    jax.block_until_ready(out)

    iters = 100
    t0 = time.perf_counter()
    for b in range(iters):
        state, out = pipe.process_block(state, blocks[b % nbuf])
    jax.block_until_ready((state, out))
    dt = time.perf_counter() - t0

    samples_per_s = iters * cfg.block_len / dt
    baseline = 10.0 * cfg.sample_rate       # 10x real-time target
    print(json.dumps({
        "metric": "samples_per_s_per_chip_8mic_srp_phat_mvdr_48k",
        "value": round(samples_per_s, 1),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_s / baseline, 3),
    }))


if __name__ == "__main__":
    main()
