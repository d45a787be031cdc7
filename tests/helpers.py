"""Synthetic multichannel test signals (SURVEY.md §4.1 style fixtures).

The reference's gtest suites feed impulses, sines, noise and artificially
delayed channel copies; these helpers generate the delayed-copy fixtures with
*fractional* sample delays applied exactly in the frequency domain, so the
injected TDOA/DOA is known to machine precision.
"""

from __future__ import annotations

import numpy as np

from mcax import geometry as geo


def fractional_delay(x: np.ndarray, delay_samples: float) -> np.ndarray:
    """Delay a real signal by a (possibly fractional) number of samples via
    an exact FFT phase ramp (circular; keep |delay| << len(x))."""
    n = len(x)
    spec = np.fft.rfft(x)
    freqs = np.arange(len(spec))
    spec = spec * np.exp(-2j * np.pi * freqs * delay_samples / n)
    return np.fft.irfft(spec, n=n)


def array_signals(geom: geo.ArrayGeometry, azimuth_rad: float, n: int,
                  seed: int = 0, noise_db: float = -40.0,
                  bandlimit: float = 0.9) -> np.ndarray:
    """Far-field source at azimuth → per-mic delayed copies. [C, N] float32.

    The source is band-limited white noise (fraction of Nyquist), each mic
    receives it delayed by  t_c(theta) * fs  samples plus independent sensor
    noise at noise_db relative to the source.
    """
    rng = np.random.default_rng(seed)
    src = rng.standard_normal(n)
    spec = np.fft.rfft(src)
    cut = int(len(spec) * bandlimit)
    spec[cut:] = 0.0
    src = np.fft.irfft(spec, n=n)
    src /= np.std(src) + 1e-12

    delays = geom.mic_delays(np.asarray([azimuth_rad]))[0] * geom.sample_rate
    out = np.stack([fractional_delay(src, d) for d in delays])
    noise = rng.standard_normal(out.shape) * (10.0 ** (noise_db / 20.0))
    return (out + noise).astype(np.float32)


def moving_sources(geom: geo.ArrayGeometry, az_start, az_end, n: int,
                   block_len: int, seed: int = 0,
                   noise_db: float = -40.0) -> np.ndarray:
    """K sources moving linearly in azimuth across the signal (piecewise
    constant per block — delays re-derived each block). [C, N] float32."""
    rng = np.random.default_rng(seed)
    az_start = np.atleast_1d(np.asarray(az_start, np.float64))
    az_end = np.atleast_1d(np.asarray(az_end, np.float64))
    k = len(az_start)
    out = np.zeros((geom.num_mics, n))
    nblocks = n // block_len
    srcs = rng.standard_normal((k, n))
    for b in range(nblocks):
        frac = b / max(nblocks - 1, 1)
        sl = slice(b * block_len, (b + 1) * block_len)
        for s in range(k):
            az = az_start[s] + frac * (az_end[s] - az_start[s])
            delays = geom.mic_delays(np.asarray([az]))[0] * geom.sample_rate
            seg = srcs[s, sl]
            for c, d in enumerate(delays):
                out[c, sl] += fractional_delay(seg, d)
    noise = rng.standard_normal(out.shape) * (10.0 ** (noise_db / 20.0))
    return (out + noise).astype(np.float32)


def to_host(x) -> np.ndarray:
    """Fetch a device array to numpy, via re/im planes when complex.

    The tunneled axon TPU backend raises UNIMPLEMENTED on complex64 host
    transfers — the exact constraint that keeps every production jit
    boundary real-valued (mcax.algos.covariance.to_planes).  Tests that
    compare complex results must fetch them the same way so the on-chip
    lane (MCAX_TEST_PLATFORM=tpu) runs on that backend too."""
    import jax.numpy as jnp
    if jnp.iscomplexobj(x):
        return (np.asarray(jnp.real(x)).astype(np.complex128)
                + 1j * np.asarray(jnp.imag(x)))
    return np.asarray(x)


def complex_to_device(a):
    """Put a complex numpy array on device via two float32 transfers
    (complex64 device transfers are UNIMPLEMENTED on the axon backend)."""
    import jax
    import jax.numpy as jnp
    a = np.asarray(a)
    return jax.lax.complex(jnp.asarray(np.real(a).astype(np.float32)),
                           jnp.asarray(np.imag(a).astype(np.float32)))


def snr_db(reference: np.ndarray, test: np.ndarray) -> float:
    """SNR of `test` against `reference` in dB (higher = closer)."""
    err = np.asarray(reference, np.float64) - np.asarray(test, np.float64)
    num = np.sum(np.asarray(reference, np.float64) ** 2)
    den = np.sum(err ** 2)
    if den == 0:
        return np.inf
    return float(10.0 * np.log10(num / max(den, 1e-300)))


def run_planes(fn, *args):
    """Run ``fn(*args)`` inside ONE jit with float-plane boundaries.

    The axon TPU backend implements neither complex host<->device
    transfers nor several eager complex ops, so on-chip tests must build
    complex values INSIDE a compiled program and fetch them as re/im
    planes — the production boundary pattern (covariance.to_planes).
    Complex numpy args are split host-side and rebuilt in-graph; complex
    output leaves come back as {"re", "im"} dicts in-graph and are
    reassembled to complex numpy here.  Output pytrees map to numpy.
    """
    import jax
    import jax.numpy as jnp

    flat_in, spec = [], []
    for a in args:
        a = np.asarray(a)
        if np.iscomplexobj(a):
            spec.append("c")
            flat_in += [np.ascontiguousarray(a.real).astype(np.float32),
                        np.ascontiguousarray(a.imag).astype(np.float32)]
        else:
            spec.append("r")
            flat_in.append(a)

    @jax.jit
    def go(*flats):
        it = iter(flats)
        rebuilt = []
        for s in spec:
            if s == "c":
                rebuilt.append(jax.lax.complex(next(it), next(it)))
            else:
                rebuilt.append(next(it))
        out = fn(*rebuilt)
        return jax.tree.map(
            lambda x: ({"re": jnp.real(x), "im": jnp.imag(x)}
                       if jnp.iscomplexobj(x) else x), out)

    def back(leaf):
        if isinstance(leaf, dict) and set(leaf) == {"re", "im"}:
            return (np.asarray(leaf["re"]).astype(np.complex64)
                    + 1j * np.asarray(leaf["im"]))
        return np.asarray(leaf)

    out = go(*flat_in)
    return jax.tree.map(back, out,
                        is_leaf=lambda x: (isinstance(x, dict)
                                           and set(x) == {"re", "im"}))
