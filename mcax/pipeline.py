"""Config-driven end-to-end pipelines (component L4, SURVEY.md §1b).

One ``Pipeline`` object per acceptance config.  Where the reference runs a
virtual-method-per-frame hot loop inside dsp::ShortTimeProcess::process
(SURVEY.md §3.1), mcax compiles ONE function that processes an entire block —
framing, windowing, batched matmul-form rFFT, the per-config algorithm,
inverse transform and streaming overlap-add — with all streaming state
(input carry, OLA tails, covariance, tracks) as an explicit donated pytree.

    pipe = Pipeline(config.CONFIG3)
    state = pipe.init_state()
    state, out = pipe.process_block(state, samples)   # [C, block_len]

``out`` is a flat dict of device arrays whose structure is static per config
(doa / tdoa / peak / audio / power), so the host loop never retraces.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mcax import config as cfg_mod
from mcax import geometry as geo
from mcax.algos import covariance as cov_mod
from mcax.algos import delaysum
from mcax.algos import gcc
from mcax.algos import masking
from mcax.algos import mvdr
from mcax.algos import particle as particle_mod
from mcax.algos import srp
from mcax.algos import tracking
from mcax.frames import stft as stft_mod
from mcax.frames.ola import streaming_overlap_add
from mcax.frames.window import make_windows
from mcax.state import PipelineState

_SYNTH_ALGOS = ("delaysum", "srp_delaysum", "mvdr", "srp_mvdr", "track_mvdr",
                "mask")
_COV_ALGOS = ("mvdr", "srp_mvdr", "track_mvdr")
_SRP_ALGOS = ("srp", "srp_delaysum", "srp_mvdr", "track_mvdr")


class Pipeline:
    """A jit-compiled streaming block processor for one PipelineConfig."""

    def __init__(self, cfg: cfg_mod.PipelineConfig, jit: bool = True,
                 donate: bool = True, scan_mode: str = "batched"):
        from mcax.utils import cache as _cache
        _cache.enable()
        self.cfg = cfg.validate()
        self.geom = cfg.geometry()
        self.pairs = self.geom.pairs
        s = cfg.stft
        self.win_a, self.win_s = make_windows(s.frame_len, s.hop, s.synthesis)
        algo = cfg.algo.name

        self.gcc_plan = (gcc.make_plan(self.geom, s.frame_len,
                                       band_hz=cfg.algo.band_hz)
                         if algo == "gcc" else None)
        self._gcc_band_masks = (gcc.multiband_masks(
            s.frame_len, cfg.sample_rate, cfg.algo.gcc_bands)
            if algo == "gcc" and cfg.algo.gcc_bands else None)
        self.srp_plan = (srp.make_plan(self.geom, s.frame_len,
                                       cfg.algo.grid_points,
                                       band_hz=cfg.algo.band_hz)
                         if algo in _SRP_ALGOS else None)
        self.fixed_steer = (delaysum.steering_vector(
            self.geom, cfg.algo.steer_azimuth_rad, s.frame_len)
            if algo in ("delaysum", "mvdr") else None)
        self.mask_phase = (masking.expected_phase(
            self.geom, cfg.algo.steer_azimuth_rad, s.frame_len)
            if algo == "mask" else None)
        if algo in _SRP_ALGOS:
            deg_per_bin = 360.0 / cfg.algo.grid_points
            self.suppress_bins = max(1, int(round(
                cfg.algo.peak_suppression_deg / deg_per_bin)))
        step = self._block_step
        if jit:
            step = jax.jit(step, donate_argnums=(0,) if donate else ())
        self._step = step
        if scan_mode not in ("batched", "scan"):
            raise ValueError(f"scan_mode must be batched|scan, got {scan_mode!r}")
        many = (self._blocks_batched if scan_mode == "batched"
                else self._blocks_scan)
        if jit:
            many = jax.jit(many, donate_argnums=(0,) if donate else ())
        self._many = many
        self._jit = jit
        self._vstep = None            # built lazily by process_streams

    # ------------------------------------------------------------------
    @property
    def frames_per_block(self) -> int:
        return self.cfg.frames_per_block

    @property
    def out_samples_per_block(self) -> int:
        return self.frames_per_block * self.cfg.stft.hop

    def init_state(self) -> PipelineState:
        cfg = self.cfg
        c = self.geom.num_mics
        lh = cfg.stft.frame_len - cfg.stft.hop
        algo = cfg.algo.name
        ola_tail = None
        if algo in _SYNTH_ALGOS:
            if algo == "track_mvdr":
                ola_tail = jnp.zeros((cfg.algo.num_sources, lh), jnp.float32)
            else:
                ola_tail = jnp.zeros((lh,), jnp.float32)
        cov = (cov_mod.init_planes(cfg.stft.num_bins, c)
               if algo in _COV_ALGOS else None)
        use_particle = (algo == "track_mvdr"
                        and cfg.algo.smoother == "particle")
        tracks = (tracking.init_tracks(cfg.algo.num_sources)
                  if algo == "track_mvdr" and not use_particle else None)
        particles = (particle_mod.init(cfg.algo.num_sources,
                                       cfg.algo.num_particles,
                                       cfg.algo.particle_seed)
                     if use_particle else None)
        return PipelineState(
            carry=jnp.zeros((c, lh), jnp.float32),
            block_idx=jnp.zeros((), jnp.int32),
            ola_tail=ola_tail,
            cov=cov,
            tracks=tracks,
            particles=particles,
        )

    def process_block(self, state: PipelineState, samples) -> Tuple[
            PipelineState, Dict[str, jnp.ndarray]]:
        samples = jnp.asarray(samples, jnp.float32)
        expect = (self.geom.num_mics, self.cfg.block_len)
        if samples.shape != expect:
            raise ValueError(f"expected samples {list(expect)}, got "
                             f"{list(samples.shape)} (mis-sized blocks would "
                             "silently retrace and shift the stream)")
        return self._step(state, samples)

    def process_blocks(self, state: PipelineState, samples) -> Tuple[
            PipelineState, Dict[str, jnp.ndarray]]:
        """Throughput mode: run B consecutive blocks in ONE dispatch.

        Args:
          samples: [B, C, block_len] — B consecutive blocks.
        Returns:
          (state, outs) where each out leaf gains a leading B axis; matches
          B process_block calls to float tolerance.

        Default mode is BATCHED (``Pipeline(..., scan_mode="batched")``):
        framing/FFT/CPS/SRP run over all B·T frames as one MXU batch and the
        only sequential recursions — covariance (via its associative monoid),
        tracking, and the OLA/carry seams (plain reshapes of the contiguous
        stream) — are factored out.  A per-block ``lax.scan`` of the whole
        step (mode "scan") keeps the MXU matmuls at T rows per step (T=24
        for config4 — mostly padding) and serialises everything; batching
        is the TPU-native shape.  "scan" remains available as the
        bit-reference for the recursion order.
        """
        samples = jnp.asarray(samples, jnp.float32)
        expect = (self.geom.num_mics, self.cfg.block_len)
        if samples.ndim != 3 or samples.shape[1:] != expect:
            raise ValueError(f"expected samples [B, {expect[0]}, {expect[1]}]"
                             f", got {list(samples.shape)}")
        return self._many(state, samples)

    def _blocks_scan(self, state: PipelineState, samples: jnp.ndarray):
        return jax.lax.scan(self._block_step, state, samples)

    # ------------------------------------------------------------------
    # Batched throughput mode: one fused step over B consecutive blocks.
    # ------------------------------------------------------------------
    def _blocks_batched(self, state: PipelineState, samples: jnp.ndarray):
        cfg = self.cfg
        hop = cfg.stft.hop
        b, c, block_len = samples.shape
        t = cfg.frames_per_block
        bt = b * t

        from mcax.kernels import dispatch as kdisp

        lh = cfg.stft.frame_len - hop
        if (cfg.stft.frame_len == 2 * hop and block_len % hop == 0
                and (block_len // hop) % 8 == 0 and t == block_len // hop
                and kdisp.stft_backend() == "fused"):
            # blocks-native analysis (r5): the fused kernel reads the
            # [B, C, T, hop] reshape-VIEW of the input directly — the
            # channel-major transpose + carry concat + slab layout copy
            # this path previously materialised were ~1.2 ms/dispatch of
            # pure data movement at the batch-512 config-4 shape
            from mcax.kernels import stft_fused as ksf

            sp_re, sp_im, new_carry = ksf.stft_fused_from_blocks(
                samples, state.carry, self.win_a, hop)
            spectra = jax.lax.complex(sp_re, sp_im)          # [C, B*T, F]
        else:
            flat = jnp.moveaxis(samples, 1, 0).reshape(c, b * block_len)
            x = jnp.concatenate([state.carry, flat], axis=-1)
            new_carry = x[:, bt * hop:]
            spectra = stft_mod.stft(x, self.win_a, hop)      # [C, B*T, F]
        # frames tile the concatenated stream exactly as the sequential
        # carry+block framing does, so spectra match the scan mode's

        algo = cfg.algo.name
        out: Dict[str, jnp.ndarray] = {}
        new_tail, new_tracks = state.ola_tail, state.tracks
        new_particles = state.particles
        cov0 = None if state.cov is None else cov_mod.from_planes(state.cov)
        new_cov = cov0

        def per_block(a):
            """[..., B*T] → [B, ..., T] (split the frame axis into blocks)."""
            r = a.reshape(*a.shape[:-1], b, t)
            return jnp.moveaxis(r, -2, 0)

        def spectra_blocks():
            """[C, B*T, F] → [B, C, T, F]."""
            r = spectra.reshape(c, b, t, spectra.shape[-1])
            return jnp.moveaxis(r, 1, 0)

        def mvdr_weights(steer):
            """(w, new_cov) via the dispatch-aware fused-to-fused rows
            fast path (mvdr.weights_and_cov_from_spectra)."""
            return mvdr.weights_and_cov_from_spectra(
                spectra, cov0, cfg.algo.cov_forget, t, steer,
                cfg.algo.diag_load)

        def resynth_stream(y):
            """y [..., B*T, F] → (out [B, ..., T*hop], new_tail): OLA over
            the whole contiguous frame stream, then split per block."""
            frames = stft_mod.istft_frames(y, self.win_s)    # [..., B*T, L]
            full, tail = streaming_overlap_add(frames, hop, state.ola_tail)
            o = full.reshape(*full.shape[:-1], b, t * hop)
            return jnp.moveaxis(o, -2, 0), tail

        if algo == "gcc":
            if cfg.algo.gcc_bands:
                res = gcc.gcc_phat_multiband(
                    spectra, self.pairs, self.gcc_plan, self._gcc_band_masks,
                    eps=cfg.algo.phat_eps, interpolate=cfg.algo.interpolate,
                    weighting=cfg.algo.gcc_weighting)
                out = {"tdoa": per_block(res["tdoa_fused"]),
                       "doa": per_block(res["doa_fused"]),
                       "tdoa_band": per_block(res["tdoa"]),
                       "peak_band": per_block(res["peak"]),
                       "peak": per_block(jnp.max(res["peak"], axis=0))}
            else:
                res = gcc.gcc_phat_block(spectra, self.pairs, self.gcc_plan,
                                         eps=cfg.algo.phat_eps,
                                         interpolate=cfg.algo.interpolate,
                                         weighting=cfg.algo.gcc_weighting)
                out = {"tdoa": per_block(res["tdoa"]),
                       "doa": per_block(res["doa"]),
                       "peak": per_block(res["peak"])}

        elif algo == "delaysum":
            y = delaysum.beamform(spectra, jnp.asarray(self.fixed_steer))
            out["audio"], new_tail = resynth_stream(y)

        elif algo == "mask":
            y = masking.mask_block(spectra, jnp.asarray(self.mask_phase),
                                   cfg.algo.mask_threshold_rad,
                                   cfg.algo.mask_sharpness)
            out["audio"], new_tail = resynth_stream(y)

        elif algo == "srp":
            power = srp.srp_surface(spectra, self.pairs, self.srp_plan,
                                    eps=cfg.algo.phat_eps)   # [B*T, G]
            az, pk = srp.argmax_doa(power, self.srp_plan,
                                    interpolate=cfg.algo.srp_interpolate)
            out = {"doa": per_block(az), "power": per_block(pk)}

        elif algo == "srp_delaysum":
            power = srp.srp_surface(spectra, self.pairs, self.srp_plan,
                                    eps=cfg.algo.phat_eps)
            pmean = jnp.mean(power.reshape(b, t, -1), axis=1)  # [B, G]
            gidx = jnp.argmax(pmean, axis=-1)                  # [B]
            steer = srp.steering_vector(self.srp_plan, gidx)   # [B, C, F]
            y = delaysum.beamform(spectra_blocks(), steer)     # [B, T, F]
            out["audio"], new_tail = resynth_stream(
                y.reshape(bt, y.shape[-1]))
            out["doa"] = jnp.asarray(self.srp_plan.azimuths_rad,
                                     jnp.float32)[gidx]

        elif algo == "mvdr":
            steer = jnp.broadcast_to(jnp.asarray(self.fixed_steer),
                                     (b, *self.fixed_steer.shape))
            w, new_cov = mvdr_weights(steer)
            y = jax.vmap(mvdr.beamform)(spectra_blocks(), w)   # [B, T, F]
            out["audio"], new_tail = resynth_stream(
                y.reshape(bt, y.shape[-1]))

        elif algo == "srp_mvdr":
            power = srp.srp_surface(spectra, self.pairs, self.srp_plan,
                                    eps=cfg.algo.phat_eps)
            pmean = jnp.mean(power.reshape(b, t, -1), axis=1)  # [B, G]
            gidx = jnp.argmax(pmean, axis=-1)
            steer = srp.steering_vector(self.srp_plan, gidx)   # [B, C, F]
            w, new_cov = mvdr_weights(steer)                   # [B, C, F]
            y = jax.vmap(mvdr.beamform)(spectra_blocks(), w)   # [B, T, F]
            out["audio"], new_tail = resynth_stream(
                y.reshape(bt, y.shape[-1]))
            out["doa"] = jnp.asarray(self.srp_plan.azimuths_rad,
                                     jnp.float32)[gidx]
            az_f, _ = srp.argmax_doa(power, self.srp_plan,
                                     interpolate=cfg.algo.srp_interpolate)
            out["doa_frame"] = per_block(az_f)

        elif algo == "track_mvdr":
            power = srp.srp_surface(spectra, self.pairs, self.srp_plan,
                                    eps=cfg.algo.phat_eps)
            pmean = jnp.mean(power.reshape(b, t, -1), axis=1)  # [B, G]
            az_grid = jnp.asarray(self.srp_plan.azimuths_rad, jnp.float32)

            if cfg.algo.smoother == "particle":
                def ptrack_step(ps, pm):
                    new_ps, doa, conf, gi = tracking.particle_track_block(
                        ps, pm, az_grid, self.suppress_bins,
                        cfg.algo.particle_step_std_rad,
                        cfg.algo.particle_resample_threshold)
                    return new_ps, (gi, doa, conf)

                new_particles, (gidx, angles, conf) = jax.lax.scan(
                    ptrack_step, state.particles, pmean)       # [B, S] each
            else:
                def track_step(tr, pm):
                    new_tr, gi = tracking.track_block(
                        tr, pm, az_grid, self.suppress_bins,
                        cfg.algo.track_smooth)
                    return new_tr, (gi, new_tr.angles_rad, new_tr.confidence)

                new_tracks, (gidx, angles, conf) = jax.lax.scan(
                    track_step, state.tracks, pmean)           # [B, S] each
            steer = srp.steering_vector(self.srp_plan, gidx)   # [B, S, C, F]
            w, new_cov = mvdr_weights(steer)                   # [B, S, C, F]
            y = jax.vmap(mvdr.beamform)(spectra_blocks(), w)   # [B, S, T, F]
            # per-source contiguous frame streams: [S, B*T, F]
            y_s = jnp.moveaxis(y, 1, 0).reshape(
                y.shape[1], bt, y.shape[-1])
            audio_s, new_tail = resynth_stream(y_s)            # [B, S, T*hop]
            out["audio"] = audio_s
            out["doa"] = angles
            out["confidence"] = conf

        else:
            raise ValueError(f"unknown algo {algo!r}")

        new_cov_planes = (state.cov if new_cov is cov0 or new_cov is None
                          else cov_mod.to_planes(new_cov))
        new_state = PipelineState(carry=new_carry,
                                  block_idx=state.block_idx + b,
                                  ola_tail=new_tail, cov=new_cov_planes,
                                  tracks=new_tracks,
                                  particles=new_particles)
        return new_state, out

    # ------------------------------------------------------------------
    # Data-parallel multi-stream mode (SURVEY.md §2a C14 "DP"): S
    # independent arrays/utterances batched through one vmapped step —
    # the serving shape (many streams per chip), not available in the
    # reference's one-object-per-stream C++ design.
    # ------------------------------------------------------------------
    def init_states(self, num_streams: int) -> PipelineState:
        one = self.init_state()
        return jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (num_streams, *x.shape)).copy(),
            one)

    def process_streams(self, states: PipelineState, samples) -> Tuple[
            PipelineState, Dict[str, jnp.ndarray]]:
        """One block for S independent streams: samples [S, C, block_len],
        states from init_states(S).  Every output leaf gains a leading S
        axis.  Identical per-stream math to process_block (vmap)."""
        samples = jnp.asarray(samples, jnp.float32)
        expect = (self.geom.num_mics, self.cfg.block_len)
        if samples.ndim != 3 or samples.shape[1:] != expect:
            raise ValueError(f"expected samples [S, {expect[0]}, {expect[1]}]"
                             f", got {list(samples.shape)}")
        if self._vstep is None:
            vstep = jax.vmap(self._block_step)
            self._vstep = jax.jit(vstep) if self._jit else vstep
        return self._vstep(states, samples)

    # ------------------------------------------------------------------
    def _block_step(self, state: PipelineState, samples: jnp.ndarray):
        cfg = self.cfg
        hop = cfg.stft.hop
        x = jnp.concatenate([state.carry, samples], axis=-1)
        t = cfg.frames_per_block
        new_carry = x[:, t * hop:]
        spectra = stft_mod.stft(x, self.win_a, hop)        # [C, T, F]

        algo = cfg.algo.name
        out: Dict[str, jnp.ndarray] = {}
        new_tail, new_tracks = state.ola_tail, state.tracks
        new_particles = state.particles
        # state.cov crosses the jit boundary as float32 re/im planes
        # (complex64 is internal-only; see covariance.to_planes)
        cov = None if state.cov is None else cov_mod.from_planes(state.cov)
        new_cov = cov

        if algo == "gcc":
            if cfg.algo.gcc_bands:
                res = gcc.gcc_phat_multiband(
                    spectra, self.pairs, self.gcc_plan, self._gcc_band_masks,
                    eps=cfg.algo.phat_eps,
                    interpolate=cfg.algo.interpolate,
                    weighting=cfg.algo.gcc_weighting)
                out = {"tdoa": res["tdoa_fused"], "doa": res["doa_fused"],
                       "tdoa_band": res["tdoa"], "peak_band": res["peak"],
                       # keep "peak" [P, T] like the full-band path (CLI
                       # and downstream consumers are shape-stable)
                       "peak": jnp.max(res["peak"], axis=0)}
            else:
                res = gcc.gcc_phat_block(spectra, self.pairs, self.gcc_plan,
                                         eps=cfg.algo.phat_eps,
                                         interpolate=cfg.algo.interpolate,
                                         weighting=cfg.algo.gcc_weighting)
                out = {"tdoa": res["tdoa"], "doa": res["doa"],
                       "peak": res["peak"]}

        elif algo == "delaysum":
            steer = jnp.asarray(self.fixed_steer)
            y = delaysum.beamform(spectra, steer)          # [T, F]
            out["audio"], new_tail = self._resynth(y, state.ola_tail)

        elif algo == "srp_delaysum":
            # SRP-steered delay-sum: the reference's "beamform toward the
            # localised DOA" composition (C7 'SRP-steered', SURVEY.md §2a)
            power = srp.srp_surface(spectra, self.pairs, self.srp_plan,
                                    eps=cfg.algo.phat_eps)
            gidx = jnp.argmax(jnp.mean(power, axis=-2), axis=-1)
            steer = srp.steering_vector(self.srp_plan, gidx)   # [C, F]
            y = delaysum.beamform(spectra, steer)
            out["audio"], new_tail = self._resynth(y, state.ola_tail)
            out["doa"] = jnp.asarray(self.srp_plan.azimuths_rad,
                                     jnp.float32)[gidx]

        elif algo == "mask":
            y = masking.mask_block(spectra, jnp.asarray(self.mask_phase),
                                   cfg.algo.mask_threshold_rad,
                                   cfg.algo.mask_sharpness)
            out["audio"], new_tail = self._resynth(y, state.ola_tail)

        elif algo == "srp":
            power = srp.srp_surface(spectra, self.pairs, self.srp_plan,
                                    eps=cfg.algo.phat_eps)   # [T, G]
            az, pk = srp.argmax_doa(power, self.srp_plan,
                                    interpolate=cfg.algo.srp_interpolate)
            out = {"doa": az, "power": pk}

        elif algo == "mvdr":
            new_cov = cov_mod.update(cov, spectra, cfg.algo.cov_forget)
            w = mvdr.weights(new_cov, jnp.asarray(self.fixed_steer),
                             cfg.algo.diag_load)
            y = mvdr.beamform(spectra, w)                  # [T, F]
            out["audio"], new_tail = self._resynth(y, state.ola_tail)

        elif algo == "srp_mvdr":
            power = srp.srp_surface(spectra, self.pairs, self.srp_plan,
                                    eps=cfg.algo.phat_eps)
            pmean = jnp.mean(power, axis=-2)               # [G]
            gidx = jnp.argmax(pmean, axis=-1)
            steer = srp.steering_vector(self.srp_plan, gidx)   # [C, F]
            new_cov = cov_mod.update(cov, spectra, cfg.algo.cov_forget)
            w = mvdr.weights(new_cov, steer, cfg.algo.diag_load)
            y = mvdr.beamform(spectra, w)
            out["audio"], new_tail = self._resynth(y, state.ola_tail)
            out["doa"] = jnp.asarray(self.srp_plan.azimuths_rad,
                                     jnp.float32)[gidx]
            az_f, _ = srp.argmax_doa(power, self.srp_plan,
                                     interpolate=cfg.algo.srp_interpolate)
            out["doa_frame"] = az_f

        elif algo == "track_mvdr":
            power = srp.srp_surface(spectra, self.pairs, self.srp_plan,
                                    eps=cfg.algo.phat_eps)
            pmean = jnp.mean(power, axis=-2)
            az_grid = jnp.asarray(self.srp_plan.azimuths_rad, jnp.float32)
            if cfg.algo.smoother == "particle":
                new_particles, doa_s, conf_s, gidx = (
                    tracking.particle_track_block(
                        state.particles, pmean, az_grid, self.suppress_bins,
                        cfg.algo.particle_step_std_rad,
                        cfg.algo.particle_resample_threshold))
            else:
                new_tracks, gidx = tracking.track_block(
                    state.tracks, pmean, az_grid,
                    self.suppress_bins, cfg.algo.track_smooth)
                doa_s = new_tracks.angles_rad
                conf_s = new_tracks.confidence
            steer = srp.steering_vector(self.srp_plan, gidx)   # [S, C, F]
            new_cov = cov_mod.update(cov, spectra, cfg.algo.cov_forget)
            w = mvdr.weights(new_cov, steer, cfg.algo.diag_load)  # [S, C, F]
            y = mvdr.beamform(spectra, w)                  # [S, T, F]
            out["audio"], new_tail = self._resynth(y, state.ola_tail)
            out["doa"] = doa_s
            out["confidence"] = conf_s

        else:
            raise ValueError(f"unknown algo {algo!r}")

        new_cov_planes = (state.cov if new_cov is cov or new_cov is None
                          else cov_mod.to_planes(new_cov))
        new_state = PipelineState(carry=new_carry,
                                  block_idx=state.block_idx + 1,
                                  ola_tail=new_tail, cov=new_cov_planes,
                                  tracks=new_tracks,
                                  particles=new_particles)
        return new_state, out

    def _resynth(self, y: jnp.ndarray, tail: jnp.ndarray):
        frames = stft_mod.istft_frames(y, self.win_s)      # [..., T, L]
        return streaming_overlap_add(frames, self.cfg.stft.hop, tail)

    # ------------------------------------------------------------------
    def run(self, samples: np.ndarray, state: Optional[PipelineState] = None):
        """Host driver: stream a whole [C, N] signal through process_block.

        Pads the tail to a whole number of blocks (zeros), returns
        (final_state, outputs) with per-block outputs stacked on a leading
        axis (host numpy).  The jit dispatch is async, so blocks overlap the
        host-side slicing naturally.
        """
        cfg = self.cfg
        c, n = samples.shape
        if c != self.geom.num_mics:
            raise ValueError(f"expected {self.geom.num_mics} channels, got {c}")
        b = cfg.block_len
        nblocks = -(-n // b)
        padded = np.zeros((c, nblocks * b), np.float32)
        padded[:, :n] = samples
        if state is None:
            state = self.init_state()
        outs = []
        for i in range(nblocks):
            state, out = self.process_block(state, padded[:, i * b:(i + 1) * b])
            outs.append(out)
        stacked = {k: np.stack([np.asarray(o[k]) for o in outs])
                   for k in outs[0]} if outs else {}
        return state, stacked


@functools.lru_cache(maxsize=None)
def get_pipeline(name: str) -> Pipeline:
    """Cached pipeline per preset name (reuses compiled steps)."""
    return Pipeline(cfg_mod.get_config(name))
