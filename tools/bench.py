"""Detailed benchmark harness (component C15, SURVEY.md §6).

Measures, on the current default device:
  * kernel microbenchmarks: matmul-form rFFT/irFFT (Pallas and XLA paths),
    fused CPS+PHAT, SRP steering matmul — with achieved FLOP/s and
    %-of-speed-of-light against the chip's fp32 matmul peak,
  * end-to-end pipeline throughput (samples/s/chip and real-time factor)
    for each acceptance config,
emitting one JSON document (use bench.py at the repo root for the driver's
single-line summary).

Speed-of-light model: fp32 matmul peak via MCAX_PEAK_FLOPS (default 4.9e13,
TPU v5e ≈ 197 bf16 TFLOP/s / 4 for fp32 accumulate); DFT cost model is the
matmul form actually executed (4*B*N*F real MACs), not N log N.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

PEAK_FLOPS = float(os.environ.get("MCAX_PEAK_FLOPS", 4.9e13))


def _timeit(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_fft(n=512, batch=8192):
    from mcax.kernels import fft as kfft
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
    res = {}
    f = n // 2 + 1
    flops = 4.0 * batch * n * f
    jit_x = jax.jit(lambda v: jnp.fft.rfft(v))
    res["xla_rfft_s"] = _timeit(jit_x, x)
    res["xla_rfft_gflops"] = flops / res["xla_rfft_s"] / 1e9
    prev = os.environ.get("MCAX_BACKEND")
    os.environ["MCAX_BACKEND"] = "pallas"
    try:
        if jax.default_backend() in ("tpu", "axon"):
            jit_p = jax.jit(kfft.rfft)
            res["pallas_rfft_s"] = _timeit(jit_p, x)
            res["pallas_rfft_gflops"] = flops / res["pallas_rfft_s"] / 1e9
            res["pallas_rfft_pct_sol"] = round(
                100.0 * flops / res["pallas_rfft_s"] / PEAK_FLOPS, 2)
    finally:
        if prev is None:
            os.environ.pop("MCAX_BACKEND", None)
        else:
            os.environ["MCAX_BACKEND"] = prev
    jit_m = jax.jit(kfft.rfft_matmul)
    res["matmul_rfft_s"] = _timeit(jit_m, x)
    res["matmul_rfft_gflops"] = flops / res["matmul_rfft_s"] / 1e9
    res["matmul_rfft_pct_sol"] = round(
        100.0 * flops / res["matmul_rfft_s"] / PEAK_FLOPS, 2)
    return res


def bench_srp(c=8, t=96, f=257, g=360):
    from mcax import geometry as geo
    from mcax.algos import srp
    from mcax.kernels import cps as kcps
    geom = geo.ArrayGeometry(positions=geo.circular_positions(c, 0.05),
                             sample_rate=16000)
    plan = srp.make_plan(geom, (f - 1) * 2, g)
    rng = np.random.default_rng(1)
    spec = jnp.asarray((rng.standard_normal((c, t, f)) +
                        1j * rng.standard_normal((c, t, f))).astype(np.complex64))
    p = geom.num_pairs
    fn = jax.jit(lambda s: srp.srp_surface(s, geom.pairs, plan))
    dt = _timeit(fn, spec)
    flops = 4.0 * t * (p * f) * g          # two real matmuls
    return {"srp_power_s": dt, "srp_gflops": flops / dt / 1e9,
            "srp_pct_sol": round(100.0 * flops / dt / PEAK_FLOPS, 2),
            "cps_phat_s": _timeit(jax.jit(
                lambda s: kcps.cps_phat(s, geom.pairs)), spec)}


def bench_pipeline(name: str, nblocks=30, scan_batch=32):
    """Per-config throughput: latency mode (block-at-a-time dispatch) and
    throughput mode (process_blocks: lax.scan over scan_batch blocks)."""
    from mcax.config import get_config
    from mcax.pipeline import Pipeline
    cfg = get_config(name)
    pipe = Pipeline(cfg)
    rng = np.random.default_rng(0)
    blocks = [jax.device_put(rng.standard_normal(
        (pipe.geom.num_mics, cfg.block_len)).astype(np.float32))
        for _ in range(4)]
    state = pipe.init_state()
    for b in range(3):
        state, out = pipe.process_block(state, blocks[b % 4])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for b in range(nblocks):
        state, out = pipe.process_block(state, blocks[b % 4])
    jax.block_until_ready((state, out))
    dt = time.perf_counter() - t0
    sps = nblocks * cfg.block_len / dt
    res = {"samples_per_s": round(sps, 1),
           "realtime_factor": round(sps / cfg.sample_rate, 2),
           "block_latency_ms": round(1e3 * dt / nblocks, 3)}

    batch = jax.device_put(rng.standard_normal(
        (scan_batch, pipe.geom.num_mics, cfg.block_len)).astype(np.float32))
    st2 = pipe.init_state()
    st2, outs = pipe.process_blocks(st2, batch)
    jax.block_until_ready(outs)
    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        st2, outs = pipe.process_blocks(st2, batch)
    jax.block_until_ready((st2, outs))
    dt = time.perf_counter() - t0
    sps2 = iters * scan_batch * cfg.block_len / dt
    res["scan_samples_per_s"] = round(sps2, 1)
    res["scan_realtime_factor"] = round(sps2 / cfg.sample_rate, 2)
    return res


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="*", default=["config1", "config3",
                                                     "config4"])
    ap.add_argument("--skip-kernels", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    report = {"device": str(jax.devices()[0]),
              "backend": jax.default_backend(),
              "peak_flops_model": PEAK_FLOPS}
    if not args.skip_kernels:
        report["fft_512"] = bench_fft(512)
        report["fft_1024"] = bench_fft(1024, batch=4096)
        report["srp"] = bench_srp()
    for name in args.configs:
        report[name] = bench_pipeline(name)
    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
