"""Direct tests of the distributed primitives (halo exchange, covariance
monoid) — SURVEY.md §7.4 'property-test shard-count invariance'."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from mcax.algos import covariance as cov_mod
from mcax.dist import halo as halo_mod
from mcax.dist import scan as dscan
from mcax.dist.mesh import TIME_AXIS, make_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def _shard_map(f, mesh, in_specs, out_specs):
    from mcax.dist.sharded import _shard_map as sm
    return sm(f, mesh, in_specs, out_specs)


@pytest.mark.parametrize("shards", [2, 4, 8])
def test_left_halo_reconstructs_contiguous_signal(shards):
    mesh = make_mesh(shards, 1)
    n, halo = 64 * shards, 16
    x = np.arange(2 * n, dtype=np.float32).reshape(2, n)
    carry = -np.ones((2, halo), np.float32)

    f = _shard_map(lambda s, c: halo_mod.left_halo(s, halo, c),
                   mesh, (P(None, TIME_AXIS), P(None, None)),
                   P(None, TIME_AXIS))
    out = np.asarray(f(x, carry))           # [2, shards*(halo + n/shards)]
    per = halo + n // shards
    out = out.reshape(2, shards, per)
    np.testing.assert_array_equal(out[:, 0, :halo], carry)
    for s in range(1, shards):
        want = x[:, s * (n // shards) - halo: s * (n // shards)]
        np.testing.assert_array_equal(out[:, s, :halo], want)
        np.testing.assert_array_equal(
            out[:, s, halo:], x[:, s * (n // shards):(s + 1) * (n // shards)])


@pytest.mark.parametrize("impl", ["ppermute", "rdma"])
@pytest.mark.parametrize("shards", [2, 4])
def test_stft_left_halo_bit_identical_to_monolithic(shards, impl,
                                                    monkeypatch):
    """The overlapped halo+STFT (interior frames independent of the
    exchange, so the scheduler can hide the collective — VERDICT round-2
    missing item 3) is BIT-identical to left_halo + monolithic stft, for
    both halo implementations."""
    if impl == "rdma":
        monkeypatch.setenv("MCAX_HALO", "rdma")
    from mcax.frames import stft as stft_mod
    from mcax.frames.window import make_windows
    rng = np.random.default_rng(2)
    hop, frame_len = 32, 128                   # n_halo = 3 halo frames
    halo = frame_len - hop
    n = 8 * hop * shards
    x = rng.standard_normal((2, n)).astype(np.float32)
    carry = rng.standard_normal((2, halo)).astype(np.float32)
    win, _ = make_windows(frame_len, hop, False)
    mesh = make_mesh(shards, 1)

    def mono(s, c):
        xl = halo_mod.left_halo(s, halo, c)
        return stft_mod.stft(xl, win, hop)

    def split(s, c):
        return halo_mod.stft_left_halo(s, halo, c, win, hop)

    specs = ((P(None, TIME_AXIS), P(None, None)), P(None, TIME_AXIS, None))
    want = np.asarray(_shard_map(mono, mesh, *specs)(x, carry))
    got = np.asarray(_shard_map(split, mesh, *specs)(x, carry))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("shards", [1, 2, 4, 8])
def test_cov_monoid_shard_count_invariance(shards):
    """The combined (decay, partial) must equal the sequential recursion for
    ANY shard count — the exactness property of the exponential monoid."""
    rng = np.random.default_rng(0)
    c, t, f = 4, 16, 9
    spec = (rng.standard_normal((c, t, f))
            + 1j * rng.standard_normal((c, t, f))).astype(np.complex64)
    lam = 0.9
    r0 = np.asarray(cov_mod.init(f, c))
    want = np.asarray(cov_mod.update(jnp.asarray(r0), jnp.asarray(spec), lam))

    mesh = make_mesh(shards, 1)
    tl = t // shards

    def local(spec_local):
        d, p = cov_mod.block_stats(spec_local, lam)
        return dscan.combine_cov_partials(d, p, TIME_AXIS)

    fn = _shard_map(local, mesh, (P(None, TIME_AXIS, None),), (P(), P()))
    decay, partial = fn(jnp.asarray(spec))
    got = r0 * np.complex64(decay) + np.asarray(partial)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("shards", [2, 4])
def test_ola_tail_exchange_matches_monolithic(shards):
    from mcax.frames.ola import overlap_add
    rng = np.random.default_rng(1)
    hop, frame_len = 32, 64
    t = 4 * shards
    frames = rng.standard_normal((t, frame_len)).astype(np.float32)
    state_tail = rng.standard_normal(frame_len - hop).astype(np.float32)

    # monolithic streaming OLA
    from mcax.frames.ola import streaming_overlap_add
    want_out, want_tail = streaming_overlap_add(jnp.asarray(frames), hop,
                                                jnp.asarray(state_tail))

    mesh = make_mesh(shards, 1)
    tl = t // shards

    def local(frames_local, tail):
        full = overlap_add(frames_local, hop)
        return halo_mod.ola_tail_exchange(full, tl * hop, tail)

    fn = _shard_map(local, mesh, (P(TIME_AXIS, None), P(None)),
                    (P(TIME_AXIS), P(None)))
    got_out, got_tail = fn(jnp.asarray(frames), jnp.asarray(state_tail))
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_tail), np.asarray(want_tail),
                               atol=1e-5)
