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
# HBM speed-of-light for traffic-bound kernels (TPU v5e ~819 GB/s)
PEAK_HBM_BPS = float(os.environ.get("MCAX_PEAK_HBM_BPS", 8.19e11))


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


def fenced_timeit(fn, x, iters=32, reps=3, detail=False):
    """Time ``fn(x)`` per-application, fenced and dispatch-amortised.

    Runs ``iters`` chained applications *inside one jit* (lax.scan whose
    carry perturbs the input, so iterations are data-dependent and cannot
    be hoisted/CSE'd), repeats the dispatch ``reps`` times chained through
    the carry, and fences once with a real scalar fetch.  The per-dispatch
    tunnel round-trip (~1 ms+) is amortised over reps*iters applications;
    the probe reduction (sum|.| over outputs) is included — numbers are
    slightly conservative.

    ``detail=True`` fences each rep individually and returns
    (median_per_iter, per_rep_list, spread_pct) so rows can self-qualify
    (VERDICT r4: the latency-shape SRP row shipped without reps/spread
    and its prose margin was disproved by the next regen).
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
    if detail:
        import statistics
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            c = many(x, c)
            float(c)                           # fence each rep
            times.append((time.perf_counter() - t0) / iters)
        med = statistics.median(times)
        spread = 100.0 * (max(times) - min(times)) / med if med else 0.0
        return med, times, round(spread, 1)
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
    prev = os.environ.get("MCAX_FFT")
    os.environ["MCAX_FFT"] = "pallas"    # MCAX_FFT outranks MCAX_BACKEND in
    try:                                 # fft_backend(), so force via it
        if jax.default_backend() in ("tpu", "axon"):
            res["pallas_rfft_s"] = fenced_timeit(kfft.rfft, x)
            res["pallas_rfft_gflops"] = flops / res["pallas_rfft_s"] / 1e9
            res["pallas_rfft_pct_sol"] = round(
                100.0 * flops / res["pallas_rfft_s"] / PEAK_FLOPS, 2)
    finally:
        if prev is None:
            os.environ.pop("MCAX_FFT", None)
        else:
            os.environ["MCAX_FFT"] = prev
    res["matmul_rfft_s"] = fenced_timeit(kfft.rfft_matmul, x)
    res["matmul_rfft_gflops"] = flops / res["matmul_rfft_s"] / 1e9
    res["matmul_rfft_pct_sol"] = round(
        100.0 * flops / res["matmul_rfft_s"] / PEAK_FLOPS, 2)
    # the backend auto actually ships (dispatch.fft_backend) — BENCH_DETAIL
    # must show it is the measured fastest path (VERDICT round-2 item 4)
    from mcax.kernels import dispatch as kdisp
    res["auto_backend"] = kdisp.fft_backend()
    timed = {"pallas": res.get("pallas_rfft_s"),
             "matmul": res["matmul_rfft_s"],
             "xla": res["xla_rfft_s"]}
    best = min((v, k) for k, v in timed.items() if v is not None)[1]
    res["fastest_backend"] = best
    res["auto_is_fastest"] = best == res["auto_backend"]
    return res


def bench_srp(c=8, t=96, f=257, g=360):
    """SRP chain (pair gather → CPS+PHAT → dual steering matmul) on both
    backends at the given shape.  t is the matmul M dimension — pass the
    BATCHED shape (blocks*frames_per_block) to measure what the throughput
    mode actually runs (VERDICT.md round-1 weak item 3)."""
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

    def cps_fn(b):
        return kcps.cps_phat(jax.lax.complex(b[0], b[1]), geom.pairs)

    flops = 4.0 * t * (p * f) * g          # two real matmuls
    res = {"shape": {"c": c, "m": t, "f": f, "g": g, "pairs": int(p)}}
    on_tpu = jax.default_backend() in ("tpu", "axon")
    prev = os.environ.get("MCAX_SRP")
    # xla = materialised CPS + jnp matmuls; matmul = materialised CPS +
    # hand-tiled Pallas dual matmul; fused = single-pass on-chip-steering
    # Pallas kernel (the measured auto default on TPU)
    for backend in (("xla", "matmul", "fused") if on_tpu else ("xla",)):
        os.environ["MCAX_SRP"] = backend
        if backend == "matmul":
            os.environ["MCAX_BACKEND"] = "pallas"
        try:
            dt, reps_s, spread = fenced_timeit(srp_fn, both, iters=16,
                                               reps=3, detail=True)
            res[f"{backend}_srp_power_s"] = dt
            res[f"{backend}_srp_reps_s"] = [round(r, 7) for r in reps_s]
            res[f"{backend}_srp_spread_pct"] = spread
            res[f"{backend}_srp_gflops"] = flops / dt / 1e9
            res[f"{backend}_srp_pct_sol"] = round(
                100.0 * flops / dt / PEAK_FLOPS, 2)
        finally:
            os.environ.pop("MCAX_BACKEND", None)
            if prev is None:
                os.environ.pop("MCAX_SRP", None)
            else:
                os.environ["MCAX_SRP"] = prev
    res["cps_phat_s"] = fenced_timeit(cps_fn, both, iters=16, reps=2)
    if on_tpu:
        from mcax.kernels import srp_fused as _sf
        res["fused_dot_tier"] = _sf._dot_tier()   # bf16 tier (PARITY.md)
    # legacy keys (round-1 BENCH_DETAIL format) = the auto-default backend
    best = "fused" if on_tpu else "xla"
    for k in ("srp_power_s", "srp_gflops", "srp_pct_sol"):
        res[k] = res[f"{best}_{k}"]
    return res


def bench_filterbank(f=257, n_mels=40, frames=262144, block=48000,
                     nch=256, fs=48000.0):
    """Filterbank kernels vs speed-of-light (BASELINE.json:5 'FFT +
    filterbank kernels measured against speed-of-light').

    All three kernels are HBM-bound (mel ≈ 17 FLOP/byte, FIR-64 ≈ 16,
    biquad ≈ 32 after the blocked-Toeplitz rewrite — all below the MXU
    ridge), so the decision roofline is pct_hbm_sol; pct_sol is reported
    for reference only.  Batch sizes are chosen so one iteration's HBM
    traffic is >= ~100x the measured ~300 us in-graph per-iteration floor
    of the tunneled backend (PERF.md round 3) — mel moves 311 MB/iter,
    biquad/FIR 98 MB/iter — making the rows honest measurements rather
    than floor artifacts (VERDICT r3 weak item 3)."""
    from mcax.frames import filters
    rng = np.random.default_rng(2)
    res = {"shape": {"frames": frames, "f": f, "n_mels": n_mels,
                     "block": block, "nch": nch}}

    w = filters.mel_filterbank((f - 1) * 2, n_mels, fs)
    spec = jnp.asarray(rng.standard_normal((frames, f)).astype(np.float32))
    dt = fenced_timeit(lambda s: filters.mel_energies(s, w), spec, iters=16,
                       reps=2)
    flops = 2.0 * frames * f * n_mels
    traffic = 4.0 * frames * (f + n_mels)      # weights stay resident
    res["mel_s"] = dt
    res["mel_gflops"] = flops / dt / 1e9
    res["mel_pct_sol"] = round(100.0 * flops / dt / PEAK_FLOPS, 2)
    res["mel_gbps"] = traffic / dt / 1e9
    res["mel_pct_hbm_sol"] = round(100.0 * traffic / dt / PEAK_HBM_BPS, 2)

    b, a = filters.butter_lowpass_sos(4000.0, fs)
    x = jnp.asarray(rng.standard_normal((nch, block)).astype(np.float32))
    dt = fenced_timeit(lambda v: filters.biquad_apply(v, b, a), x,
                       iters=8)
    traffic = 4.0 * 2 * nch * block            # read + write the stream
    res["biquad_s"] = dt
    res["biquad_samples_per_s"] = nch * block / dt
    res["biquad_gbps"] = traffic / dt / 1e9
    res["biquad_pct_hbm_sol"] = round(100.0 * traffic / dt / PEAK_HBM_BPS, 2)

    taps = np.hanning(64).astype(np.float32)
    dt = fenced_timeit(lambda v: filters.fir_apply(v, taps), x, iters=8)
    flops = 2.0 * nch * block * 64
    res["fir64_s"] = dt
    res["fir64_gflops"] = flops / dt / 1e9
    res["fir64_pct_sol"] = round(100.0 * flops / dt / PEAK_FLOPS, 2)
    res["fir64_gbps"] = traffic / dt / 1e9
    res["fir64_pct_hbm_sol"] = round(100.0 * traffic / dt / PEAK_HBM_BPS, 2)
    return res


def bench_mvdr(b=512, f=513, c=8, s=0):
    """MVDR weight solve (diag load + complex Cholesky + dual substitution
    + normalise) on both backends at the batched config-4 shape.  The
    honest roofline is HBM traffic: covs in + w out once (the fused
    kernel's actual streams); arithmetic is ~C^3/3 complex MACs/bin, far
    below the ridge.

    r5 (VERDICT r4 weak 2): the harness' per-iteration probe/perturbation
    floor is measured explicitly (``harness_floor_s`` — an identity
    function through the same fenced scan) and each backend row carries a
    ``floor_bound`` flag when the floor is a significant fraction of its
    time; b defaults to the full batch-512 shape so the solve work
    amortises the floor instead of drowning in it (the r4 rows at b=64
    read 1.03x for a kernel the in-pipeline profile shows ~70x)."""
    from mcax.algos import mvdr as mvdr_mod
    rng = np.random.default_rng(3)
    n = b * f
    x = jnp.asarray(rng.standard_normal((2, b, f, c, 3 * c))
                    .astype(np.float32))
    ph = jnp.asarray(rng.uniform(-np.pi, np.pi, (
        (b, s, c, f) if s else (b, c, f))).astype(np.float32))
    res = {"shape": {"b": b, "f": f, "c": c, "sources": s or 1}}
    traffic = 4.0 * n * (2 * c * c + 4 * (s or 1) * c)

    @jax.jit
    def mk_covs(packed):
        xs = jax.lax.complex(packed[0], packed[1])
        covs = jnp.einsum("bfck,bfdk->bfcd", xs, jnp.conj(xs),
                          precision=jax.lax.Precision.HIGHEST) / (3 * c)
        return jnp.stack([jnp.real(covs), jnp.imag(covs)])

    cov_planes = mk_covs(x)           # built once, outside the timed fn
    dcos, dsin = jnp.cos(ph), jnp.sin(ph)   # steering built outside too

    def solve(p):
        covs = jax.lax.complex(p[0], p[1])
        d = jax.lax.complex(dcos, dsin)
        w = mvdr_mod.weights_blocks(covs, d, 0.01)
        return jnp.real(w), jnp.imag(w)

    on_tpu = jax.default_backend() in ("tpu", "axon")
    # the harness' own floor: an identity "solve" through the same fenced
    # scan (input perturbation + probe reduction, no solve) — any backend
    # row within 3x of this is flagged floor_bound (VERDICT r4 weak 2)
    floor = fenced_timeit(
        lambda p: (p[0, :1, :1, 0, 0], p[1, :1, :1, 0, 0]),
        cov_planes, iters=8, reps=2)
    res["harness_floor_s"] = floor
    prev = os.environ.get("MCAX_MVDR")
    for backend in (("xla", "fused") if on_tpu else ("xla",)):
        os.environ["MCAX_MVDR"] = backend
        try:
            dt = fenced_timeit(solve, cov_planes, iters=8, reps=2)
            res[f"{backend}_solve_s"] = dt
            res[f"{backend}_gbps"] = traffic / dt / 1e9
            res[f"{backend}_pct_hbm_sol"] = round(
                100.0 * traffic / dt / PEAK_HBM_BPS, 2)
            res[f"{backend}_floor_bound"] = bool(dt < 3.0 * floor)
        finally:
            if prev is None:
                os.environ.pop("MCAX_MVDR", None)
            else:
                os.environ["MCAX_MVDR"] = prev
    if on_tpu and "fused_solve_s" in res:
        res["fused_speedup_vs_xla"] = round(
            res["xla_solve_s"] / res["fused_solve_s"], 2)
        # when the fused row is floor-bound the ratio measures the
        # harness, not the kernel — the in-pipeline profile delta is the
        # load-bearing number (PERF.md)
        res["speedup_floor_bound"] = bool(res["fused_floor_bound"])
    return res


def _rel_err(got, want) -> float:
    """On-device relative L2 error, fetched as ONE real fp32 scalar —
    sound on backends without complex host transfers (axon)."""

    @jax.jit
    def err(g, w):
        num = jnp.sum(jnp.abs(g - w) ** 2)
        den = jnp.sum(jnp.abs(w) ** 2) + jnp.float32(1e-30)
        return jnp.sqrt(num / den).astype(jnp.float32)

    return float(err(got, want))


def verify_kernels(c=8, t=24, blocks=64, f=513, g=360):
    """On-chip numerical verification of every shipped fused-kernel path
    against its XLA reference, AT the production batched shapes — the
    committed harness behind the BENCH_DETAIL claims (VERDICT r3 item 1:
    'tools/bench.py gains a --verify mode asserting fused-vs-xla parity
    on-chip so BENCH_DETAIL rows are self-checking').

    Every comparison runs on-device and fetches a single float scalar;
    returns {check: {rel_err, bound, pass}} and an overall "ok"."""
    from mcax import geometry as geo
    from mcax.algos import covariance as cov_mod
    from mcax.algos import srp
    from mcax.kernels import cps as kcps
    from mcax.kernels import fft as kfft
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if not on_tpu:
        # CPU lane: the fused kernels run in interpret mode (CI fake
        # backend); on TPU the COMPILED kernels are what's verified
        os.environ["MCAX_PALLAS_INTERPRET"] = "1"
    rng = np.random.default_rng(11)
    m = blocks * t
    geom = geo.ArrayGeometry(positions=geo.circular_positions(c, 0.05),
                             sample_rate=16000)
    plan = srp.make_plan(geom, (f - 1) * 2, g)
    # inputs live as FLOAT planes; complex is built INSIDE each jitted
    # thunk — the axon backend implements neither complex transfers nor
    # several eager complex ops, so every program boundary stays real
    sr = jnp.asarray(rng.standard_normal((c, m, f)).astype(np.float32))
    si = jnp.asarray(rng.standard_normal((c, m, f)).astype(np.float32))

    checks = {}

    def _planes(v):
        if jnp.iscomplexobj(v):
            return jnp.stack([jnp.real(v), jnp.imag(v)], axis=-1)
        return v

    def run(name, fn_env_pairs, bound):
        """fn_env_pairs: [(env_overrides, fn(spec)->value)] — first the
        candidate, second the reference; each traced/jitted under its env
        with float-plane boundaries."""
        outs = []
        for env, fn in fn_env_pairs:
            saved = {k: os.environ.get(k) for k in env}
            os.environ.update(env)
            try:
                jf = jax.jit(lambda a, b: _planes(fn(jax.lax.complex(a, b))))
                outs.append(jf(sr, si))
            finally:
                for k, v in saved.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
        err = _rel_err(outs[0], outs[1])
        checks[name] = {"rel_err": err, "bound": bound,
                        "pass": bool(err < bound)}

    # matmul-form rDFT (the shipped TPU auto tier) vs jnp.fft
    x = jnp.asarray(rng.standard_normal((4096, 512)).astype(np.float32))
    run("rfft_matmul_vs_jnp_fft",
        [({"MCAX_FFT_PRECISION": "highest"},
          lambda s_: kfft.rfft_matmul(x)),
         ({}, lambda s_: jnp.fft.rfft(x))], 1e-5)
    # the shipped TPU default tier (bf16x3 'high' since r4): ~99 dB
    run("rfft_matmul_high_vs_jnp_fft",
        [({"MCAX_FFT_PRECISION": "high"},
          lambda s_: kfft.rfft_matmul(x)),
         ({}, lambda s_: jnp.fft.rfft(x))], 5e-5)
    if on_tpu:
        run("rfft_pallas_vs_jnp_fft",
            [({"MCAX_FFT": "pallas", "MCAX_FFT_PRECISION": "highest"},
              lambda s_: kfft.rfft(x)),
             ({}, lambda s_: jnp.fft.rfft(x))], 1e-5)

    # fused CPS+PHAT (Pallas) vs the jnp form
    run("cps_phat_pallas_vs_xla",
        [({"MCAX_BACKEND": "pallas"},
          lambda s_: kcps.cps_phat(s_[:, :256], geom.pairs)),
         ({"MCAX_BACKEND": "xla"},
          lambda s_: kcps.cps_phat(s_[:, :256], geom.pairs))], 1e-5)

    # fused single-pass SRP kernel vs the materialised-CPS XLA path, at
    # a batched shape.  r5: the default bf16x3 hi/lo dot tier carries
    # ~1.5e-5 relative error and the in-kernel range reduction removed
    # the aperture-dependent cos/sin term, so the bound is 1e-4 — the
    # same class as every other check (was 1e-2 in r4, whose real cause
    # was Mosaic's single-bf16-pass default dots).  The on-chip pytest
    # lane additionally asserts the exact peak choice.
    run("srp_fused_vs_xla",
        [({"MCAX_SRP": "fused"},
          lambda s_: srp.srp_surface(s_[:, :t * 8], geom.pairs, plan)),
         ({"MCAX_SRP": "xla", "MCAX_BACKEND": "xla"},
          lambda s_: srp.srp_surface(s_[:, :t * 8], geom.pairs, plan))],
        1e-4 if on_tpu else 1e-5)
    # ...and at a config4-like 48 kHz / 10 cm-aperture shape, where the
    # steering phases reach |omega tau| ~ 50 rad: pins that the fused
    # kernel's accuracy is NOT input-dependent (VERDICT r4 weak 5 — the
    # r4 bound was only ever measured at 16 kHz / 5 cm)
    geom48 = geo.ArrayGeometry(positions=geo.circular_positions(8, 0.10),
                               sample_rate=48000)
    plan48 = srp.make_plan(geom48, 1024, g)
    sr48 = jnp.asarray(rng.standard_normal((8, t * 8, 513))
                       .astype(np.float32))
    si48 = jnp.asarray(rng.standard_normal((8, t * 8, 513))
                       .astype(np.float32))

    def run48(name, env_pairs, bound):
        outs = []
        for env, fn in env_pairs:
            saved = {k: os.environ.get(k) for k in env}
            os.environ.update(env)
            try:
                jf = jax.jit(lambda a, b: _planes(fn(jax.lax.complex(a, b))))
                outs.append(jf(sr48, si48))
            finally:
                for k, v in saved.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
        err = _rel_err(outs[0], outs[1])
        checks[name] = {"rel_err": err, "bound": bound,
                        "pass": bool(err < bound)}

    run48("srp_fused_vs_xla_48k_widearray",
          [({"MCAX_SRP": "fused"},
            lambda s_: srp.srp_surface(s_, geom48.pairs, plan48)),
           ({"MCAX_SRP": "xla", "MCAX_BACKEND": "xla"},
            lambda s_: srp.srp_surface(s_, geom48.pairs, plan48))],
          1e-4 if on_tpu else 1e-5)

    # fused covariance-prefix kernel vs the einsum+scan reference
    run("covprefix_fused_vs_xla",
        [({"MCAX_COV": "fused"},
          lambda s_: cov_mod.block_prefixes(s_, None, 0.93, t)),
         ({"MCAX_COV": "xla"},
          lambda s_: cov_mod.block_prefixes(s_, None, 0.93, t))], 1e-5)

    # fused MVDR weight solve vs the unrolled XLA chain, on covariances
    # produced by the real covprefix path (built inside each jit)
    from mcax.algos import mvdr as mvdr_mod
    dph = jnp.asarray(rng.uniform(-np.pi, np.pi,
                                  (8, c, f)).astype(np.float32))

    def _mvdr(s_):
        covs = cov_mod.block_prefixes(s_[:, :t * 8], None, 0.93, t)
        dvec = jnp.exp(jax.lax.complex(jnp.float32(0.0), dph))
        return mvdr_mod.weights_blocks(covs, dvec, 0.01)

    run("mvdr_fused_vs_xla",
        [({"MCAX_MVDR": "fused", "MCAX_COV": "xla"}, _mvdr),
         ({"MCAX_MVDR": "xla", "MCAX_COV": "xla"}, _mvdr)], 1e-4)

    return {"backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "shape": {"c": c, "frames_per_block": t, "blocks": blocks,
                      "f": f, "g": g},
            "checks": checks,
            "ok": all(v["pass"] for v in checks.values())}


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
    for b in range(10):                          # program warm-up (PERF.md)
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
           "block_latency_ms": round(1e3 * dt / nblocks, 3),
           # provenance: both modes in one process, back to back — on the
           # tunneled backend these rows can latch a slow dispatch mode and
           # disagree ~2x with fresh_process_median rows (PERF.md)
           "timing": "in_process_sweep"}

    # serving-loop latency modes WITH per-block host fetches (the CLI's
    # real loop; outputs are real-valued, so fetches are axon-safe):
    #   sync      — fetch block k before dispatching k+1 (pipeline depth 1)
    #   pipelined — dispatch k+1, then fetch k (depth 2; the CLI default,
    #               SURVEY §7.4 "fetch results one block late")
    import jax.tree_util as jtu
    for mode in ("sync", "pipelined"):
        st3 = pipe.init_state()
        for b in range(6):
            st3, out = pipe.process_block(st3, blocks[b % 4])
        _fence_tree(out)
        prev = None
        t0 = time.perf_counter()
        for b in range(nblocks):
            st3, out = pipe.process_block(st3, blocks[b % 4])
            if mode == "sync":
                jtu.tree_map(np.asarray, out)
            else:
                # the CLI's pipelined loop: start the D2H copies at
                # dispatch time, block on them one block late
                for leaf in jtu.tree_leaves(out):
                    try:
                        leaf.copy_to_host_async()
                    except (AttributeError, RuntimeError):
                        break
                if prev is not None:
                    jtu.tree_map(np.asarray, prev)
                prev = out
        if prev is not None:
            jtu.tree_map(np.asarray, prev)
        dt = time.perf_counter() - t0
        sps3 = nblocks * cfg.block_len / dt
        res[f"{mode}_fetch_samples_per_s"] = round(sps3, 1)
        res[f"{mode}_fetch_realtime_factor"] = round(
            sps3 / cfg.sample_rate, 2)

    batch = jax.device_put(rng.standard_normal(
        (scan_batch, pipe.geom.num_mics, cfg.block_len)).astype(np.float32))
    st2 = pipe.init_state()
    # several warm-up dispatches: the tunneled backend runs the first few
    # executions of each program ~10x slow (measured round 2: config3's
    # first timed round 111 ms/dispatch, steady state 6.8 ms)
    for _ in range(6):
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


def timed_pipeline(name: str, mesh_arg=None, scan_batch=32, scan_iters=8,
                   reps=5):
    """Median-of-reps throughput (samples/s) for one pipeline flavour:
    the plain single-device Pipeline (``mesh_arg=None``) or ShardedPipeline
    on a TxC mesh.  One flavour = one compiled program; run each flavour in
    its OWN process on the tunneled backend (see bench_sharded)."""
    import statistics

    from mcax.config import get_config
    from mcax.dist import mesh as mesh_mod
    from mcax.dist.sharded import ShardedPipeline
    from mcax.pipeline import Pipeline

    cfg = get_config(name)
    if mesh_arg is None:
        pipe = Pipeline(cfg, donate=False)
    else:
        ts, cs = (int(v) for v in mesh_arg.lower().split("x"))
        pipe = ShardedPipeline(cfg, mesh_mod.make_mesh(ts, cs), donate=False)
    rng = np.random.default_rng(0)
    batch = jax.device_put(rng.standard_normal(
        (scan_batch, cfg.array.num_mics, cfg.block_len)).astype(np.float32))
    st = pipe.init_state()
    for _ in range(6):                           # program warm-up (PERF.md)
        st, outs = pipe.process_blocks(st, batch)
    _fence_tree(outs)
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(scan_iters):
            st, outs = pipe.process_blocks(st, batch)
        _fence_tree(outs)
        _fence_tree(st)
        vals.append(scan_iters * scan_batch * cfg.block_len / (
            time.perf_counter() - t0))
    med = statistics.median(vals)
    return {"samples_per_s": round(med, 1),
            "spread_pct": round(100.0 * (max(vals) - min(vals)) / med, 1),
            "reps": [round(v, 1) for v in vals]}


def _timed_subprocess(name: str, mesh_arg, scan_batch=32,
                      scan_iters=8) -> dict:
    """timed_pipeline in a FRESH single-program process.

    On the tunneled TPU backend, dispatch throughput is bimodal per
    (process, program): a program alternating with another in one process
    can latch the ~4x-slow mode for the whole timing (PERF.md round-2
    'tunnel measurement hazards'; measured round 3: ShardedPipeline 1x1
    config4 = 34.5 M samples/s alone in a process, 3.5 M when timed after
    the plain Pipeline in the same process).  Scaling efficiency compares
    two programs, so each gets its own process."""
    import subprocess
    import sys

    args = [sys.executable, os.path.abspath(__file__), "--timed-one", name,
            "--scan-batch", str(scan_batch), "--scan-iters", str(scan_iters)]
    if mesh_arg is not None:
        args += ["--mesh", mesh_arg]
    env = dict(os.environ)
    if jax.default_backend() == "cpu":
        # the child must reproduce the forced virtual-device CPU mesh
        # (the sandbox sitecustomize pins the TPU backend; main() flips
        # it back when this env var is present)
        n = max(len(jax.devices()), 1)
        env["MCAX_TIMED_CPU_DEVICES"] = str(n)
    out = subprocess.run(args, capture_output=True, text=True, check=True,
                         env=env,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    return json.loads(out.stdout.strip().splitlines()[-1])


def _timed_paired(name: str, mesh_arg: str, scan_batch=32, scan_iters=8,
                  rounds=8):
    """Paired sharded-vs-plain timing for the virtual CPU mesh.

    Both pipelines live in this process, both fully warmed; each round
    times one fenced burst of each flavour, alternating which goes first
    (ABBA) so neither systematically inherits a warmer cache.  Returns
    (single, sharded) dicts whose samples_per_s are medians and whose
    reps lists align round-by-round — consumers can recompute the
    per-round ratios this design exists for."""
    import statistics

    from mcax.config import get_config
    from mcax.dist import mesh as mesh_mod
    from mcax.dist.sharded import ShardedPipeline
    from mcax.pipeline import Pipeline

    cfg = get_config(name)
    ts, cs = (int(v) for v in mesh_arg.lower().split("x"))
    plain = Pipeline(cfg, donate=False)
    shard = ShardedPipeline(cfg, mesh_mod.make_mesh(ts, cs), donate=False)
    rng = np.random.default_rng(0)
    batch = jax.device_put(rng.standard_normal(
        (scan_batch, cfg.array.num_mics, cfg.block_len)).astype(np.float32))
    states = {"plain": plain.init_state(), "shard": shard.init_state()}
    pipes = {"plain": plain, "shard": shard}

    def burst(key):
        st = states[key]
        t0 = time.perf_counter()
        for _ in range(scan_iters):
            st, outs = pipes[key].process_blocks(st, batch)
        _fence_tree(outs)
        _fence_tree(st)
        states[key] = st
        return scan_iters * scan_batch * cfg.block_len / (
            time.perf_counter() - t0)

    for key in ("plain", "shard", "plain", "shard"):   # compile + warm
        burst(key)
    vals = {"plain": [], "shard": []}
    for r in range(rounds):
        order = ("plain", "shard") if r % 2 == 0 else ("shard", "plain")
        for key in order:
            vals[key].append(burst(key))

    def pack(v):
        med = statistics.median(v)
        return {"samples_per_s": round(med, 1),
                "spread_pct": round(100.0 * (max(v) - min(v)) / med, 1),
                "reps": [round(x, 1) for x in v]}

    return pack(vals["plain"]), pack(vals["shard"])


def bench_sharded(name: str, mesh_arg: str, scan_batch=32, scan_iters=8):
    """ShardedPipeline throughput on a TxC mesh (scaling harness, C15).

    Reports samples/s over the whole mesh AND samples/s/device, plus the
    scaling efficiency against the single-device Pipeline — the
    BASELINE.json:5 ">=80% scaling" metric.  On the forced multi-device CPU
    mesh this measures collective overhead (label it as such: CPU cores are
    not TPU chips); on a real pod slice it is the true scaling number.

    On TPU-like backends the two measurements run in separate fresh
    processes (see _timed_subprocess); on CPU they run in-process (no
    tunnel, and the forced-device-count flags would not survive a fresh
    interpreter).
    """
    ts, cs = (int(v) for v in mesh_arg.lower().split("x"))
    n_dev = ts * cs
    if jax.default_backend() in ("tpu", "axon"):
        # the tunneled TPU backend latches per-process dispatch modes, so
        # each flavour gets its own fresh process
        single = _timed_subprocess(name, None, scan_batch, scan_iters)
        sharded = _timed_subprocess(name, mesh_arg, scan_batch, scan_iters)
        timing = "fresh_process_median"
    else:
        # r5 (VERDICT r4 weak 3/missing 1): on the 2-core CPU box both
        # unpaired designs swing ~±10% run-to-run (box load drift), and
        # the in-process sweep additionally depends on program history.
        # The PAIRED design times the two flavours in alternating ABBA
        # order within each round and takes the median of PER-ROUND
        # ratios — drift common to a round cancels in its ratio.
        single, sharded = _timed_paired(name, mesh_arg, scan_batch,
                                        scan_iters)
        timing = "paired_alternating_rounds"
    single_sps, sharded_sps = (single["samples_per_s"],
                               sharded["samples_per_s"])
    # both medians carry noise; a row whose efficiency deviation is within
    # the combined spread cannot distinguish overhead from measurement
    # noise — flag it so consumers (and regressions checks) know
    spread = max(single["spread_pct"], sharded["spread_pct"])
    per_dev = sharded_sps / n_dev
    eff = 100.0 * per_dev / single_sps
    res = {"mesh": f"{ts}x{cs}", "devices": n_dev, "timing": timing,
           "single_device_samples_per_s": round(single_sps, 1),
           "sharded_samples_per_s": round(sharded_sps, 1),
           "sharded_samples_per_s_per_device": round(per_dev, 1),
           "scaling_efficiency_pct": round(eff, 1),
           "reps": single["reps"], "spread_pct": spread,
           "noise_limited": bool(abs(eff - 100.0) < spread)}
    if jax.default_backend() == "cpu" and n_dev > 1:
        # n virtual devices share ONE CPU's silicon, so per-device
        # efficiency is capped at ~100/n % even with zero collective cost;
        # efficiency/ceiling isolates the collective+reorg overhead, which
        # IS the transferable signal from this environment
        res["virtual_ceiling_pct"] = round(100.0 / n_dev, 1)
        if timing == "paired_alternating_rounds":
            # the paired design's statistic is the median of PER-ROUND
            # ratios (round-common drift cancels); the reps lists align
            # round-by-round by construction
            import statistics
            ratios = [100.0 * sh / si for si, sh in
                      zip(single["reps"], sharded["reps"])]
            res["pct_of_virtual_ceiling"] = round(
                statistics.median(ratios), 1)
            res["per_round_pct"] = [round(r_, 1) for r_ in ratios]
            res["reps_single"] = single["reps"]
            res["reps_sharded"] = sharded["reps"]
            spread = round(100.0 * (max(ratios) - min(ratios))
                           / statistics.median(ratios), 1)
            res["spread_pct"] = spread
        else:
            res["pct_of_virtual_ceiling"] = round(
                100.0 * per_dev / single_sps * n_dev, 1)
        # on the virtual mesh the decision metric is pct-of-ceiling, so the
        # noise flag must qualify THAT number, not the raw efficiency
        res["noise_limited"] = bool(
            abs(res["pct_of_virtual_ceiling"] - 100.0) < spread)
        res["note"] = ("virtual CPU mesh: same silicon under every device; "
                       "pct_of_virtual_ceiling is the collective-overhead "
                       "metric, not chip scaling")
    else:
        res["note"] = ("real accelerator mesh; each flavour timed in its "
                       "own fresh process (median of reps) — see "
                       "_timed_subprocess")
    return res


def main(argv=None):
    if os.environ.get("MCAX_TIMED_CPU_DEVICES"):
        # child of a CPU-mesh _timed_subprocess: rebuild the forced
        # virtual-device CPU platform before any backend use (the
        # sandbox sitecustomize registers the TPU backend at interpreter
        # start, so env vars alone cannot select CPU — same dance as
        # tests/conftest.py)
        n = os.environ["MCAX_TIMED_CPU_DEVICES"]
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n}"
            ).strip()
        from jax._src import xla_bridge as _xb
        jax.config.update("jax_platforms", "cpu")
        _xb._clear_backends()
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="*", default=["config1", "config3",
                                                     "config4"])
    ap.add_argument("--skip-kernels", action="store_true")
    ap.add_argument("--mesh", default=None, metavar="TxC",
                    help="also bench ShardedPipeline on this mesh and "
                         "report scaling efficiency vs single device")
    ap.add_argument("--batched-shapes", action="store_true",
                    help="bench the SRP kernel at the *batched* pipeline "
                         "shapes (M = blocks*frames) too")
    ap.add_argument("--out", default=None)
    ap.add_argument("--update", action="store_true",
                    help="merge into an existing --out JSON instead of "
                         "overwriting it (used to combine the on-chip kernel "
                         "sweep with the virtual-CPU-mesh scaling rows, "
                         "which necessarily run in different processes)")
    ap.add_argument("--tag", default=None,
                    help="nest this run's report under the given key "
                         "(e.g. --tag scaling_virtual_8dev)")
    ap.add_argument("--timed-one", default=None, metavar="CONFIG",
                    help="internal: time ONE pipeline flavour (plain, or "
                         "sharded when --mesh is also given) and print "
                         '{"samples_per_s": N, "spread_pct": S, "reps": R} '
                         "— used by bench_sharded to isolate each program "
                         "in a fresh process")
    ap.add_argument("--scan-batch", type=int, default=32)
    ap.add_argument("--scan-iters", type=int, default=8)
    ap.add_argument("--verify", action="store_true",
                    help="run on-device fused-vs-xla parity assertions at "
                         "the production shapes and print the report; "
                         "exits 1 if any check fails")
    args = ap.parse_args(argv)
    from mcax.utils import cache as _cache
    _cache.enable()                  # kernel benches compile outside Pipeline
    if args.verify:
        rep = verify_kernels()
        text = json.dumps(rep, indent=2)
        print(text)
        if args.out:
            with open(args.out, "w") as fh:
                fh.write(text + "\n")
        raise SystemExit(0 if rep["ok"] else 1)
    if args.timed_one:
        print(json.dumps(timed_pipeline(args.timed_one, args.mesh,
                                        args.scan_batch, args.scan_iters)))
        return
    report = {"device": str(jax.devices()[0]),
              "backend": jax.default_backend(),
              "peak_flops_model": PEAK_FLOPS}
    if not args.skip_kernels:
        report["fft_512"] = bench_fft(512)
        report["fft_1024"] = bench_fft(1024, batch=4096)
        report["filterbank"] = bench_filterbank()
        report["mvdr_solve"] = bench_mvdr()
        report["mvdr_solve_config5"] = bench_mvdr(b=256, f=257, c=16, s=2)
        report["srp"] = bench_srp()
        if args.batched_shapes:
            # the shapes the throughput mode actually runs (64-block
            # dispatch): config4 = 8 mic / F=513 / M=64*24; config5 =
            # 16 mic / F=257 / M=64*16
            report["srp_config4_batched"] = bench_srp(c=8, t=1536, f=513)
            report["srp_config5_batched"] = bench_srp(c=16, t=1024, f=257)
    for name in args.configs:
        report[name] = bench_pipeline(name, scan_batch=args.scan_batch,
                                      scan_iters=args.scan_iters)
    if args.mesh:
        report["scaling"] = {
            name: bench_sharded(name, args.mesh, args.scan_batch,
                                args.scan_iters)
            for name in args.configs}
    if args.tag:
        report = {args.tag: report}
    if args.update and args.out and os.path.exists(args.out):
        with open(args.out) as f:
            merged = json.load(f)
        merged.update(report)
        report = merged
    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
