"""Localise a source with SRP-PHAT over an 8-mic circular array.

The mcax equivalent of running the reference's SRP-PHAT demo binary
(mcarray's localisation module + callback, SURVEY.md §3.3): synthesise a
source at a known azimuth, stream blocks through the config-3 pipeline,
and print the per-block DOA estimates.

    python examples/localize.py [azimuth_deg]
"""

import sys

import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))   # runnable as `python examples/<x>.py`

from mcax.config import get_config
from mcax.pipeline import Pipeline


def synthesize_scene(geom, az_rad, n, seed=0):
    """Band-limited noise source at az_rad, each mic's copy delayed by its
    exact fractional arrival offset (FFT phase ramp, far field)."""
    rng = np.random.default_rng(seed)
    src = rng.standard_normal(n).astype(np.float64)
    spec = np.fft.rfft(src)
    spec[int(len(spec) * 0.9):] = 0.0                      # band-limit
    delays = geom.mic_delays(np.asarray([az_rad]))[0] * geom.sample_rate
    k = np.arange(len(spec))
    out = np.stack([
        np.fft.irfft(spec * np.exp(-2j * np.pi * k * d / n), n=n)
        for d in delays])
    return out.astype(np.float32)


def main(az_deg: float = 40.0, nblocks: int = 8) -> float:
    cfg = get_config("config3")            # 8-mic circular, 360x1 deg grid
    pipe = Pipeline(cfg)
    geom = pipe.geom
    x = synthesize_scene(geom, np.deg2rad(az_deg), cfg.block_len * nblocks)
    state = pipe.init_state()
    est = []
    for b in range(nblocks):
        block = x[:, b * cfg.block_len:(b + 1) * cfg.block_len]
        state, out = pipe.process_block(state, block)
        doa = np.rad2deg(np.median(np.asarray(out["doa"])))
        est.append(doa)
        print(f"block {b}: DOA {doa:+7.2f} deg  "
              f"(peak power {float(np.median(np.asarray(out['power']))):.3f})")
    final = float(np.median(est[nblocks // 2:]))
    print(f"final estimate: {final:+.2f} deg (true {az_deg:+.2f})")
    return final


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 40.0)
