"""NumPy/SciPy golden oracles (SURVEY.md §4.2.1).

Independent, loop-level, float64 implementations of every mcax component —
the stand-in for the absent reference binaries.  Deliberately written in the
most obvious (slow) style so a mismatch implicates the TPU implementation.
"""

from __future__ import annotations

import numpy as np

from mcax import geometry as geo


# ---------------------------------------------------------------------------
# Frames
# ---------------------------------------------------------------------------

def frame_signal(x: np.ndarray, frame_len: int, hop: int) -> np.ndarray:
    n = x.shape[-1]
    t = (n - frame_len) // hop + 1 if n >= frame_len else 0
    return np.stack([x[..., k * hop:k * hop + frame_len] for k in range(t)],
                    axis=-2)


def stft(x: np.ndarray, window: np.ndarray, hop: int) -> np.ndarray:
    frames = frame_signal(x, len(window), hop) * window.astype(np.float64)
    return np.fft.rfft(frames, axis=-1)


def istft_ola(spectra: np.ndarray, window: np.ndarray, hop: int) -> np.ndarray:
    frames = np.fft.irfft(spectra, n=len(window), axis=-1) * window
    *lead, t, frame_len = frames.shape
    out = np.zeros((*lead, (t - 1) * hop + frame_len))
    for k in range(t):
        out[..., k * hop:k * hop + frame_len] += frames[..., k, :]
    return out


# ---------------------------------------------------------------------------
# GCC-PHAT (SURVEY.md §3.2)
# ---------------------------------------------------------------------------

def cps_phat(spectra: np.ndarray, pairs: np.ndarray, eps: float = 1e-12,
             weighted: bool = True) -> np.ndarray:
    out = []
    for (i, j) in pairs:
        g = spectra[..., i, :, :] * np.conj(spectra[..., j, :, :])
        if weighted:
            g = g / (np.abs(g) + eps)
        out.append(g)
    return np.stack(out, axis=-3)


def gcc_phat_tdoa(spectra: np.ndarray, pairs: np.ndarray, n_fft: int,
                  max_lag_per_pair: np.ndarray, fs: float,
                  eps: float = 1e-12, interpolate: bool = True) -> np.ndarray:
    """Per-pair, per-frame TDOA in seconds; brute-force loops."""
    g = cps_phat(spectra, pairs, eps)
    cc = np.fft.irfft(g, n=n_fft, axis=-1)
    p, t = cc.shape[-3], cc.shape[-2]
    tdoas = np.zeros((p, t))
    for pi in range(p):
        ml = int(max_lag_per_pair[pi])
        ml = min(ml, n_fft // 2 - 1)
        lags = np.arange(-ml, ml + 1)
        for ti in range(t):
            vals = np.array([cc[pi, ti, l % n_fft] for l in lags])
            k = int(np.argmax(vals))
            lag = float(lags[k])
            if interpolate and 0 < k < len(vals) - 1:
                ym1, y0, yp1 = vals[k - 1], vals[k], vals[k + 1]
                den = ym1 - 2 * y0 + yp1
                if abs(den) > 1e-12:
                    lag += float(np.clip(0.5 * (ym1 - yp1) / den, -0.5, 0.5))
            tdoas[pi, ti] = lag / fs
    return tdoas


# ---------------------------------------------------------------------------
# SRP-PHAT (SURVEY.md §3.3) — brute-force triple loop
# ---------------------------------------------------------------------------

def srp_surface(spectra: np.ndarray, geom: geo.ArrayGeometry,
                azimuths_rad: np.ndarray, n_fft: int,
                eps: float = 1e-12) -> np.ndarray:
    pairs = geom.pairs
    g = cps_phat(spectra, pairs, eps)                      # [P, T, F]
    tau = geom.pair_tdoas(azimuths_rad)                    # [G, P]
    f = n_fft // 2 + 1
    omega = 2.0 * np.pi * geom.sample_rate * np.arange(f) / n_fft
    p, t, _ = g.shape
    gpts = len(azimuths_rad)
    power = np.zeros((t, gpts))
    for gi in range(gpts):
        for pi in range(p):
            steer = np.exp(1j * omega * tau[gi, pi])       # [F]
            power[:, gi] += np.real(g[pi] @ steer)
    return power


# ---------------------------------------------------------------------------
# Covariance + MVDR (SURVEY.md §3.4) — float64 complex, per-frame loop
# ---------------------------------------------------------------------------

def covariance_update(cov: np.ndarray, spectra: np.ndarray,
                      forget: float) -> np.ndarray:
    c, t, f = spectra.shape
    r = cov.astype(np.complex128).copy()
    for k in range(t):
        x = spectra[:, k, :].T                             # [F, C]
        outer = x[:, :, None] * np.conj(x[:, None, :])
        r = forget * r + (1.0 - forget) * outer
    return r


def mvdr_weights(cov: np.ndarray, steer: np.ndarray,
                 diag_load: float) -> np.ndarray:
    """cov [F, C, C], steer [C, F] → w [C, F] (complex128)."""
    f, c, _ = cov.shape
    w = np.zeros((c, f), np.complex128)
    for fi in range(f):
        r = cov[fi]
        r = r + diag_load * (np.trace(r).real / c) * np.eye(c)
        d = steer[:, fi]
        y = np.linalg.solve(r, d)
        w[:, fi] = y / (np.conj(d) @ y)
    return w


def delay_sum(spectra: np.ndarray, steer: np.ndarray) -> np.ndarray:
    """spectra [C, T, F], steer [C, F] → [T, F]."""
    return np.einsum("cf,ctf->tf", np.conj(steer), spectra) / spectra.shape[0]
