"""Filters/filterbank vs scipy oracles; streaming-carry invariance."""

import numpy as np
import pytest
from scipy import signal as sps

from mcax.frames import filters as flt


def test_fir_matches_scipy_lfilter():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 1000)).astype(np.float32)
    taps = sps.firwin(31, 0.3).astype(np.float32)
    y, _ = flt.fir_apply(x, taps)
    want = sps.lfilter(taps, [1.0], x, axis=-1)
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-4)


def test_fir_streaming_equals_offline():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(2048).astype(np.float32)
    taps = sps.firwin(17, 0.25).astype(np.float32)
    off, _ = flt.fir_apply(x, taps)
    carry = None
    parts = []
    for b in range(4):
        y, carry = flt.fir_apply(x[b * 512:(b + 1) * 512], taps, carry)
        parts.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(parts), np.asarray(off),
                               atol=1e-5)


def test_preemphasis_matches_scipy():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(512).astype(np.float32)
    y, _ = flt.preemphasis(x, 0.97)
    want = sps.lfilter([1.0, -0.97], [1.0], x)
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-5)


@pytest.mark.parametrize("cutoff", [1000.0, 4000.0])
def test_biquad_matches_scipy_lfilter(cutoff):
    rng = np.random.default_rng(3)
    fs = 16000.0
    x = rng.standard_normal(2000).astype(np.float32)
    b, a = flt.butter_lowpass_sos(cutoff, fs)
    y, _ = flt.biquad_apply(x, b, a)
    want = sps.lfilter(b, a, x)
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-3)


def test_biquad_streaming_equals_offline():
    rng = np.random.default_rng(4)
    x = rng.standard_normal(1024).astype(np.float32)
    b, a = flt.butter_lowpass_sos(2000.0, 16000.0)
    off, _ = flt.biquad_apply(x, b, a)
    carry = None
    parts = []
    for blk in range(4):
        y, carry = flt.biquad_apply(x[blk * 256:(blk + 1) * 256], b, a, carry)
        parts.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(parts), np.asarray(off),
                               atol=1e-4)


def test_butter_matches_scipy_design():
    b, a = flt.butter_lowpass_sos(3000.0, 48000.0)
    bs, as_ = sps.butter(2, 3000.0 / 24000.0)
    np.testing.assert_allclose(b, bs, atol=1e-9)
    np.testing.assert_allclose(a, as_, atol=1e-9)


def test_mel_filterbank_properties():
    w = flt.mel_filterbank(512, 40, 16000.0)
    assert w.shape == (40, 257)
    assert np.all(w >= 0.0)
    # every filter has support; interior bins covered by at least one filter
    assert np.all(w.sum(axis=1) > 0.0)
    covered = w.sum(axis=0)
    assert np.all(covered[5:250] > 0.0)


def test_mel_energies_shape():
    rng = np.random.default_rng(5)
    ps = rng.uniform(0, 1, (7, 257)).astype(np.float32)
    w = flt.mel_filterbank(512, 24, 16000.0)
    e = np.asarray(flt.mel_energies(ps, w))
    assert e.shape == (7, 24)
    np.testing.assert_allclose(e, ps @ w.T, rtol=1e-5)


def test_biquad_streaming_odd_blocks_equals_offline():
    """Streaming with block lengths that are NOT multiples of the biquad
    chunk exercises the padded-tail carry reconstruction (tail_weights)."""
    rng = np.random.default_rng(5)
    x = rng.standard_normal(900).astype(np.float32)
    b, a = flt.butter_lowpass_sos(1500.0, 16000.0)
    off, off_c = flt.biquad_apply(x, b, a)
    carry = None
    parts = []
    for lo, hi in ((0, 300), (300, 601), (601, 900)):
        y, carry = flt.biquad_apply(x[lo:hi], b, a, carry)
        parts.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(parts), np.asarray(off),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(carry), np.asarray(off_c),
                               atol=1e-4)
