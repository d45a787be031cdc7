"""Detailed benchmark harness (component C15, SURVEY.md §6).

Measures, on the current default device:
  * kernel microbenchmarks: matmul-form rFFT/irFFT (Pallas and XLA paths),
    fused CPS+PHAT, SRP steering matmul — with achieved FLOP/s and
    %-of-speed-of-light against the chip's fp32 matmul peak,
  * end-to-end pipeline throughput (samples/s/chip and real-time factor)
    for each acceptance config,
emitting one JSON document (use bench.py at the repo root for the driver's
single-line summary).

Timing methodology (IMPORTANT): on the tunneled TPU backend
``jax.block_until_ready`` returns without waiting for device execution and
does not surface runtime errors, so naive host loops measure dispatch rate,
not compute.  Every measurement here instead

  1. threads a data dependency through the iterations (iteration i+1's
     input depends on iteration i's output), so independent dispatches
     cannot be overlapped, elided, or farmed out, and
  2. fences with a device->host fetch of a real scalar derived from the
     final output, which cannot complete before the computation does
     (complex transfers are unimplemented on that backend — probes are
     always real-valued).

The dependency injection adds one elementwise pass over the input per
iteration (x + c*1e-30), making all numbers slightly conservative.

Speed-of-light model: fp32 matmul peak via MCAX_PEAK_FLOPS (default 3.3e13 —
TPU v5e ≈ 197 bf16 TFLOP/s, fp32 via HIGHEST ≈ 6 bf16 passes); DFT cost
model is the matmul form actually executed (4*B*N*F real MACs), not N log N.
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

PEAK_FLOPS = float(os.environ.get("MCAX_PEAK_FLOPS", 3.3e13))


def _probe(tree) -> jnp.ndarray:
    """Reduce any output pytree to one real fp32 scalar that depends on
    every leaf (so no part of the computation can be dead-code-eliminated)."""
    total = jnp.float32(0.0)
    for leaf in jax.tree_util.tree_leaves(tree):
        if jnp.iscomplexobj(leaf):
            total = total + jnp.sum(jnp.abs(leaf)).astype(jnp.float32)
        else:
            total = total + jnp.sum(jnp.abs(leaf.astype(jnp.float32)))
    return total


def fenced_timeit(fn, x, iters=32, reps=3):
    """Time ``fn(x)`` per-application, fenced and dispatch-amortised.

    Runs ``iters`` chained applications *inside one jit* (lax.scan whose
    carry perturbs the input, so iterations are data-dependent and cannot
    be hoisted/CSE'd), repeats the dispatch ``reps`` times chained through
    the carry, and fences once with a real scalar fetch.  The per-dispatch
    tunnel round-trip (~1 ms+) is amortised over reps*iters applications;
    the probe reduction (sum|.| over outputs) is included — numbers are
    slightly conservative.
    """

    @jax.jit
    def many(x, c):
        def body(c, _):
            out = fn(x + c * jnp.float32(1e-30))
            return _probe(out) * jnp.float32(1e-30), None
        c, _ = jax.lax.scan(body, c, None, length=iters)
        return c

    c = jnp.float32(0.0)
    c = many(x, c)
    float(c)                                   # fence warmup/compile
    t0 = time.perf_counter()
    for _ in range(reps):
        c = many(x, c)
    float(c)                                   # fence: real scalar fetch
    return (time.perf_counter() - t0) / (reps * iters)


def bench_fft(n=512, batch=8192):
    from mcax.kernels import fft as kfft
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
    res = {}
    f = n // 2 + 1
    flops = 4.0 * batch * n * f
    res["xla_rfft_s"] = fenced_timeit(jnp.fft.rfft, x)
    res["xla_rfft_gflops"] = flops / res["xla_rfft_s"] / 1e9
    prev = os.environ.get("MCAX_BACKEND")
    os.environ["MCAX_BACKEND"] = "pallas"
    try:
        if jax.default_backend() in ("tpu", "axon"):
            res["pallas_rfft_s"] = fenced_timeit(kfft.rfft, x)
            res["pallas_rfft_gflops"] = flops / res["pallas_rfft_s"] / 1e9
            res["pallas_rfft_pct_sol"] = round(
                100.0 * flops / res["pallas_rfft_s"] / PEAK_FLOPS, 2)
    finally:
        if prev is None:
            os.environ.pop("MCAX_BACKEND", None)
        else:
            os.environ["MCAX_BACKEND"] = prev
    res["matmul_rfft_s"] = fenced_timeit(kfft.rfft_matmul, x)
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
    # complex inputs are formed ON device from one real array (complex
    # host->device transfers are unimplemented on the tunneled backend)
    both = jnp.asarray(rng.standard_normal((2, c, t, f)).astype(np.float32))
    p = geom.num_pairs

    def srp_fn(b):
        spec = jax.lax.complex(b[0], b[1])
        return srp.srp_surface(spec, geom.pairs, plan)

    dt = fenced_timeit(srp_fn, both)
    flops = 4.0 * t * (p * f) * g          # two real matmuls
    def cps_fn(b):
        return kcps.cps_phat(jax.lax.complex(b[0], b[1]), geom.pairs)
    return {"srp_power_s": dt, "srp_gflops": flops / dt / 1e9,
            "srp_pct_sol": round(100.0 * flops / dt / PEAK_FLOPS, 2),
            "cps_phat_s": fenced_timeit(cps_fn, both)}


def _fence_tree(tree) -> float:
    """Fence on an existing output pytree: fetch one real scalar element."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if not jnp.iscomplexobj(leaf):
            return float(jnp.asarray(leaf).ravel()[0])
    raise ValueError("no real leaf to fence on")


def bench_pipeline(name: str, nblocks=30, scan_batch=32, scan_iters=16):
    """Per-config throughput: latency mode (block-at-a-time dispatch) and
    throughput mode (process_blocks: lax.scan over scan_batch blocks).

    Both modes are naturally chained (the state pytree threads through every
    call), so one final real-scalar fetch is a sound fence."""
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
    _fence_tree(out)
    t0 = time.perf_counter()
    for b in range(nblocks):
        state, out = pipe.process_block(state, blocks[b % 4])
    _fence_tree(out)
    _fence_tree(state)
    dt = time.perf_counter() - t0
    sps = nblocks * cfg.block_len / dt
    res = {"samples_per_s": round(sps, 1),
           "realtime_factor": round(sps / cfg.sample_rate, 2),
           "block_latency_ms": round(1e3 * dt / nblocks, 3)}

    batch = jax.device_put(rng.standard_normal(
        (scan_batch, pipe.geom.num_mics, cfg.block_len)).astype(np.float32))
    st2 = pipe.init_state()
    st2, outs = pipe.process_blocks(st2, batch)
    _fence_tree(outs)
    t0 = time.perf_counter()
    for _ in range(scan_iters):
        st2, outs = pipe.process_blocks(st2, batch)
    _fence_tree(outs)
    _fence_tree(st2)
    dt = time.perf_counter() - t0
    sps2 = scan_iters * scan_batch * cfg.block_len / dt
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
