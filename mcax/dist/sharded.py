"""Sharded streaming pipeline over a ('time','channel') mesh (SURVEY.md §3.5).

The distributed block step — the build-only capability the single-process
reference has no analogue of.  One ``shard_map``-ed function per config runs
the whole chain with exactly the collectives of SURVEY.md §3.5:

  ppermute   left halo (frame_len - hop samples) from the time neighbor
  all_gather spectra over 'channel' (cross-shard mic pairs need full C)
  psum       SRP steered-power pair-partials over 'channel'
  all_gather covariance (decay, partial) monoid elements over 'time'
  ppermute   overlap-add spill to the right time neighbor

Sharding layout:
  samples [C, N]        → P('channel', 'time')     (mics x sample blocks)
  steering E [P, F, G]  → P('channel', None, None) (pair-parallel, resident)
  state pytree          → replicated (tiny: carries, tails, R, tracks)
  audio out [..., M]    → P(..., 'time')           (hop-aligned shards)
  per-frame DOA [T]     → P('time')

Outputs and state match the single-device ``mcax.pipeline.Pipeline`` to
float-reassociation tolerance; tests/dist asserts parity on a forced
8-device CPU mesh for every config (SURVEY.md §4.2.3).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mcax import config as cfg_mod
from mcax.algos import covariance as cov_mod
from mcax.algos import delaysum
from mcax.algos import gcc
from mcax.algos import masking
from mcax.algos import mvdr
from mcax.algos import particle as particle_mod
from mcax.algos import srp
from mcax.algos import tracking
from mcax.dist import collectives as coll
from mcax.dist import halo as halo_mod
from mcax.dist import scan as dscan
from mcax.dist.mesh import CHANNEL_AXIS, TIME_AXIS
from mcax.frames import stft as stft_mod
from mcax.frames.ola import overlap_add
from mcax.frames.window import make_windows
from mcax.kernels import dispatch
from mcax.kernels import srp_fused
from mcax.kernels import steer as ksteer
from mcax.pipeline import _COV_ALGOS, _SRP_ALGOS, _SYNTH_ALGOS
from mcax.state import PipelineState


def _shard_map(f, mesh, in_specs, out_specs):
    """shard_map across jax versions (check_vma vs check_rep kwarg).

    Replication checking is ON in guard mode (MCAX_CHECK_VMA=1, see
    mcax.dist.collectives): there the data-path gathers switch to the
    psum-based invariant form whose replication vma inference CAN prove.
    In production the gathers are plain all_gather — bytes-identical
    output that the checker cannot statically verify — so the check must
    stay off; CI runs the guarded twin and asserts bit-parity instead."""
    sm = getattr(jax, "shard_map", None)
    if sm is None:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map as sm
    check = coll.guard_enabled()
    try:
        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_vma=check)
    except TypeError:  # pragma: no cover - older kwarg name
        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_rep=check)


class ShardedPipeline:
    """Distributed twin of ``Pipeline``: same config, state and outputs,
    executed over a ('time', 'channel') mesh."""

    def __init__(self, cfg: cfg_mod.PipelineConfig, mesh: Mesh,
                 jit: bool = True, donate: bool = True,
                 scan_mode: str = "batched"):
        if scan_mode not in ("batched", "scan"):
            raise ValueError(f"scan_mode must be batched|scan, got {scan_mode!r}")
        self.scan_mode = scan_mode
        from mcax.utils import cache as _cache
        _cache.enable()
        self.cfg = cfg.validate()
        self.mesh = mesh
        self.st = mesh.shape[TIME_AXIS]
        self.sc = mesh.shape[CHANNEL_AXIS]
        self.geom = cfg.geometry()
        c = self.geom.num_mics
        if c % self.sc:
            raise ValueError(f"{c} mics not divisible by {self.sc} channel shards")
        t = cfg.frames_per_block
        if t % self.st:
            raise ValueError(f"{t} frames/block not divisible by {self.st} time shards")
        s = cfg.stft
        spill = s.frame_len - s.hop
        if spill > (t // self.st) * s.hop:
            raise ValueError("time shards too fine: OLA spill crosses >1 shard")
        self.win_a, self.win_s = make_windows(s.frame_len, s.hop, s.synthesis)
        self.pairs = self.geom.pairs
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
            self._prep_pair_sharded_steering()

        self._build_step(jit, donate)
        if scan_mode == "batched":
            self._build_batched(jit, donate)
        else:
            self._many_batched = None

    # ------------------------------------------------------------------
    def _prep_pair_sharded_steering(self):
        """Pad pairs (and steering tables) so the pair axis splits over the
        'channel' mesh axis; padded pairs get zero steering → zero power.

        Fused backend (kernels/srp_fused.py, the measured single-chip
        winner): no [P, F, G] steering matrices are materialised at all —
        each shard carries only its [Pl, G] TDOA slice plus a [Pl, 3]
        (a, b, valid) pair table, and the kernel synthesises its steering
        phases on-chip.  valid=0 marks pad rows (their PHAT weight is
        zeroed inside the kernel), so any shard count works, not just
        divisors of P."""
        plan = self.srp_plan
        p = self.pairs.shape[0]
        f = self.cfg.stft.num_bins
        g = plan.e_re.shape[-1]
        p_pad = -(-p // self.sc) * self.sc
        sh_vec = NamedSharding(self.mesh, P(CHANNEL_AXIS, None))
        self._srp_fused = (dispatch.srp_backend() == "fused"
                           and plan.tau_pg is not None)
        if self._srp_fused:
            ptab = np.zeros((p_pad, 3), np.int32)
            ptab[:p, :2] = self.pairs
            ptab[:p, 2] = 1
            tau = np.zeros((p_pad, g), np.float32)
            tau[:p] = plan.tau_pg
            self._pairs_pad = jax.device_put(ptab, sh_vec)
            self._tau_pad = jax.device_put(tau, sh_vec)
            return
        pairs_pad = np.zeros((p_pad, 2), np.int32)
        pairs_pad[:p] = self.pairs
        e_re = np.zeros((p_pad, f, g), np.float32)
        e_im = np.zeros((p_pad, f, g), np.float32)
        e_re[:p] = plan.e_re.reshape(p, f, g)
        e_im[:p] = plan.e_im.reshape(p, f, g)
        sh_pair = NamedSharding(self.mesh, P(CHANNEL_AXIS, None, None))
        self._pairs_pad = jax.device_put(pairs_pad, sh_vec)
        self._e_re = jax.device_put(e_re, sh_pair)
        self._e_im = jax.device_put(e_im, sh_pair)

    # ------------------------------------------------------------------
    def _build_step(self, jit: bool, donate: bool):
        cfg = self.cfg
        algo = cfg.algo.name
        state_spec = jax.tree_util.tree_map(lambda _: P(), self._state_struct())

        out_spec: Dict[str, P] = {}
        if algo == "gcc":
            out_spec = {"tdoa": P(None, TIME_AXIS), "doa": P(None, TIME_AXIS),
                        "peak": P(None, TIME_AXIS)}
            if cfg.algo.gcc_bands:
                out_spec.update({"tdoa_band": P(None, None, TIME_AXIS),
                                 "peak_band": P(None, None, TIME_AXIS)})
        elif algo == "srp":
            out_spec = {"doa": P(TIME_AXIS), "power": P(TIME_AXIS)}
        elif algo in ("delaysum", "mask", "mvdr"):
            out_spec = {"audio": P(TIME_AXIS)}
        elif algo == "srp_delaysum":
            out_spec = {"audio": P(TIME_AXIS), "doa": P()}
        elif algo == "srp_mvdr":
            out_spec = {"audio": P(TIME_AXIS), "doa": P(),
                        "doa_frame": P(TIME_AXIS)}
        elif algo == "track_mvdr":
            out_spec = {"audio": P(None, TIME_AXIS), "doa": P(),
                        "confidence": P()}

        in_specs = [state_spec, P(CHANNEL_AXIS, TIME_AXIS)]
        extra = ()
        if algo in _SRP_ALGOS:
            if self._srp_fused:
                in_specs += [P(CHANNEL_AXIS, None), P(CHANNEL_AXIS, None)]
                extra = (self._pairs_pad, self._tau_pad)
            else:
                in_specs += [P(CHANNEL_AXIS, None),
                             P(CHANNEL_AXIS, None, None),
                             P(CHANNEL_AXIS, None, None)]
                extra = (self._pairs_pad, self._e_re, self._e_im)
        self._extra = extra

        sm_step = _shard_map(self._local_step, self.mesh,
                             in_specs=tuple(in_specs),
                             out_specs=(state_spec, out_spec))
        step = sm_step
        if jit:
            step = jax.jit(step, donate_argnums=(0,) if donate else ())
        self._step = step

        def blocks_scan(state, samples_blocks):
            return jax.lax.scan(
                lambda c, x: sm_step(c, x, *self._extra), state,
                samples_blocks)
        many = blocks_scan
        if jit:
            many = jax.jit(many, donate_argnums=(0,) if donate else ())
        self._many = many

    # ------------------------------------------------------------------
    # Batched throughput mode (mirrors Pipeline._blocks_batched): shard
    # over BLOCKS on the 'time' axis — each time shard owns B/st consecutive
    # blocks and runs the fused single-device batched math locally; the
    # cross-shard pieces are the left-halo ppermute, the channel all-gather
    # / pair psum, an all-gather of per-shard covariance monoid aggregates
    # (exclusive shard prefix), replicated tracking over the psum'd+gathered
    # per-block SRP means, and the OLA spill ppermute.
    # ------------------------------------------------------------------
    def _build_batched(self, jit: bool, donate: bool):
        cfg = self.cfg
        algo = cfg.algo.name
        state_spec = jax.tree_util.tree_map(lambda _: P(), self._state_struct())
        T, CH = TIME_AXIS, CHANNEL_AXIS

        if algo == "gcc":
            out_spec = {"tdoa": P(T), "doa": P(T), "peak": P(T)}
            if cfg.algo.gcc_bands:
                out_spec.update({"tdoa_band": P(T), "peak_band": P(T)})
        elif algo == "srp":
            out_spec = {"doa": P(T), "power": P(T)}
        elif algo in ("delaysum", "mask", "mvdr"):
            out_spec = {"audio": P(T)}
        elif algo == "srp_delaysum":
            out_spec = {"audio": P(T), "doa": P(T)}
        elif algo == "srp_mvdr":
            out_spec = {"audio": P(T), "doa": P(T), "doa_frame": P(T)}
        elif algo == "track_mvdr":
            out_spec = {"audio": P(T), "doa": P(), "confidence": P()}
        else:
            raise ValueError(f"unknown algo {algo!r}")

        in_specs = [state_spec, P(T, CH, None)]
        if algo in _SRP_ALGOS:
            if self._srp_fused:
                in_specs += [P(CH, None), P(CH, None)]
            else:
                in_specs += [P(CH, None), P(CH, None, None),
                             P(CH, None, None)]

        sm = _shard_map(self._local_blocks_batched, self.mesh,
                        in_specs=tuple(in_specs),
                        out_specs=(state_spec, out_spec))
        many = lambda st, x: sm(st, x, *self._extra)
        if jit:
            many = jax.jit(many, donate_argnums=(0,) if donate else ())
        self._many_batched = many

    def _local_blocks_batched(self, state: PipelineState, samples_local,
                              *extra):
        cfg = self.cfg
        hop = cfg.stft.hop
        lh = cfg.stft.frame_len - hop
        c = self.geom.num_mics
        cl = c // self.sc
        ci = lax.axis_index(CHANNEL_AXIS)
        ti = lax.axis_index(TIME_AXIS)
        bl, _, block_len = samples_local.shape              # [Bl, cl, L]
        t = cfg.frames_per_block
        bt = bl * t

        algo = cfg.algo.name
        flat = jnp.moveaxis(samples_local, 1, 0).reshape(cl, bl * block_len)
        carry_local = lax.dynamic_slice(state.carry, (ci * cl, 0), (cl, lh))
        # bt*hop == bl*block_len, so the next carry is just this shard's
        # tail — independent of the halo exchange, like the interior STFT.
        # MVDR-family algos replicate it through their MERGED time+channel
        # gathers instead of a dedicated psum+all_gather pair (r5: on the
        # virtual mesh every collective is an n-way rendezvous on shared
        # silicon, so collective COUNT is what the scaling proxy pays).
        carry_tail_local = flat[:, -lh:]
        mvdr_family = algo in ("mvdr", "srp_mvdr", "track_mvdr")
        if mvdr_family:
            new_carry = None              # set by the merged gathers below
        else:
            new_carry = self._replicate_carry(carry_tail_local)
        spectra_local = halo_mod.stft_left_halo(
            flat, lh, carry_local, self.win_a, hop)              # [cl, BlT, F]
        spectra = self._gather_channels(spectra_local)           # [C, BlT, F]
        f = spectra.shape[-1]

        out: Dict[str, jnp.ndarray] = {}
        new_tail, new_tracks = state.ola_tail, state.tracks
        new_particles = state.particles
        cov0 = None if state.cov is None else cov_mod.from_planes(state.cov)
        new_cov = cov0

        def per_block(a):
            r = a.reshape(*a.shape[:-1], bl, t)
            return jnp.moveaxis(r, -2, 0)

        def spectra_blocks():
            return jnp.moveaxis(spectra.reshape(c, bl, t, f), 1, 0)

        # Frequency-sharded MVDR chain (VERDICT r3 item 3): per-bin
        # covariance + Cholesky solve + beamform are independent across
        # bins, so with channel shards present each shard takes F/sc bins
        # instead of all sc shards repeating identical full-F work.  The
        # only new collective is one all-gather of the beamformed spectrum
        # slice (and of the F-sliced cov state) — a few hundred KB —
        # replacing sc-fold replicated compute AND shrinking the
        # covariance-monoid shard-aggregate gather by sc.
        fshard = self.sc > 1 and algo in ("mvdr", "srp_mvdr", "track_mvdr")
        if fshard:
            fsl = -(-f // self.sc)
            fpad = fsl * self.sc
            pad_mask = (ci * fsl + jnp.arange(fsl) >= f
                        ).astype(jnp.float32)                # [fsl]

            def fslice(x, axis=-1):
                # clipped gather of THIS shard's bins + a zero mask on the
                # clipped tail — r5: the old jnp.pad-then-dynamic-slice
                # materialised a full padded copy of the (gathered, large)
                # operand per shard before slicing 1/sc of it; the pad
                # copies were among the largest non-compute ops in the
                # virtual-mesh profile (wrapped_pad).  Values identical:
                # pad bins are exactly zero either way.
                ax = axis % x.ndim
                idx = jnp.clip(ci * fsl + jnp.arange(fsl), 0, f - 1)
                sl = jnp.take(x, idx, axis=ax)
                shape = [1] * x.ndim
                shape[ax] = fsl
                keep = (1.0 - pad_mask).reshape(shape)
                return sl * keep.astype(
                    jnp.float32 if not jnp.iscomplexobj(sl) else sl.dtype)

            def fgather(x, axis=-1):
                ax = axis % x.ndim
                g = coll.gather(x, CHANNEL_AXIS, axis=ax, tiled=True)
                return lax.slice_in_dim(g, 0, f, axis=ax)

        def pair_power():
            """Pair-sharded steered power over this shard's frames, summed
            over the 'channel' (pair) shards: [Bl*T, G]."""
            return self._srp_power(spectra, extra)

        # --- MVDR-family collective structure (r5) -----------------------
        # The chain's cross-shard pieces are merged into exactly TWO
        # collectives: one 'time' gather carrying {next-carry tail,
        # covariance monoid shard-aggregate (+decay), per-block SRP means
        # for tracking} and one 'channel' gather carrying {beamformed
        # F-slice, F-sliced final covariance, carry}.  r4 spent SEVEN
        # rendezvous on the same data (collect_last psum + carry
        # all_gather + dag + pag gathers + final-cov psum + y and ncov
        # fgathers); on the shared-silicon virtual mesh each rendezvous
        # stalls all n device threads, and collective COUNT — not payload
        # — dominated config5's scaling-proxy miss (76-79% vs the >=80%
        # bar).  Values are packed as f32 planes, bit-identically.
        def cov_local(spec):
            """Local monoid pieces + the f32-packed shard aggregate."""
            t_ = cfg.frames_per_block
            ploc = cov_mod.block_prefixes(spec, None,
                                          cfg.algo.cov_forget, t_)
            dloc = jnp.float32(cfg.algo.cov_forget) ** (
                t_ * (jnp.arange(bl, dtype=jnp.float32) + 1.0))
            pack = jnp.concatenate(
                [jnp.real(ploc[-1]).reshape(-1),
                 jnp.imag(ploc[-1]).reshape(-1), dloc[-1:]])
            return ploc, dloc, pack

        def cov_complete(ploc, dloc, ag, cov0_):
            """Finish the exclusive-prefix composition from the gathered
            [st, 2*F*C*C+1] aggregate rows; returns (covs, final cov)."""
            fdim, cdim = ploc.shape[-3], ploc.shape[-1]
            npk = fdim * cdim * cdim
            pag = jax.lax.complex(
                ag[:, :npk], ag[:, npk:2 * npk]).reshape(
                    -1, fdim, cdim, cdim).astype(ploc.dtype)
            dag = ag[:, -1]                                  # [st]

            def combine(lhs, rhs):
                d1, p1 = lhs
                d2, p2 = rhs
                return (d1 * d2,
                        d2[..., None, None, None].astype(p1.dtype) * p1 + p2)

            dpre, ppre = jax.lax.associative_scan(combine, (dag, pag))
            # exclusive prefix for this shard: identity for shard 0
            d_exc = jnp.where(ti == 0, jnp.float32(1.0),
                              dpre[jnp.maximum(ti - 1, 0)])
            p_exc = jnp.where(ti == 0, jnp.zeros_like(ppre[0]),
                              ppre[jnp.maximum(ti - 1, 0)])
            d_tot = d_exc * dloc                             # [Bl]
            p_tot = (dloc[..., None, None, None].astype(p_exc.dtype) * p_exc
                     + ploc)
            covs = (d_tot[:, None, None, None].astype(cov0_.dtype) * cov0_
                    + p_tot)
            # global final covariance = the INCLUSIVE prefix over all
            # shards, already in hand on every shard from the gathered
            # aggregates — the former psum of the last shard's last block
            # recomputed the same value with one more rendezvous
            ncov_ = (dpre[-1].astype(cov0_.dtype) * cov0_ + ppre[-1])
            return covs, ncov_

        def time_merge(parts):
            """ONE tiled=False gather over 'time' of concatenated f32
            flats; returns the per-part [st, size] rows.  GUARD MODE runs
            one gather per part instead: packing mixes each part's
            variance set into the union (e.g. the channel-varying carry
            tail would taint the tracking surfaces), and vma inference
            types the whole packed buffer at once — the bytes are
            identical either way (test_guards pins it)."""
            if coll.guard_enabled():
                return [coll.gather(p.reshape(-1), TIME_AXIS, tiled=False)
                        for p in parts]
            sizes = [int(np.prod(p.shape)) for p in parts]
            g = coll.gather(
                jnp.concatenate([p.reshape(-1) for p in parts]),
                TIME_AXIS, tiled=False)                      # [st, sum]
            outs, off = [], 0
            for s_ in sizes:
                outs.append(g[:, off:off + s_])
                off += s_
            return outs

        def channel_merge(y_c, ncov_c, carry_last):
            """ONE gather over 'channel' for the beamformed F-slice, the
            F-sliced final covariance and the carry; reassembles full-F
            complex tensors.  sc == 1 (no channel shards): everything is
            already full — no collective at all.  GUARD MODE gathers the
            three separately: y is legitimately time-VARYING (each time
            shard's own blocks) and packing it with the replicated state
            leaves would make vma infer carry/cov time-varying too."""
            if not fshard:
                return y_c, ncov_c, carry_last
            if coll.guard_enabled():
                carry_full = coll.gather(carry_last, CHANNEL_AXIS,
                                         axis=0, tiled=True)
                return fgather(y_c), fgather(ncov_c, axis=0), carry_full
            parts = [jnp.real(y_c), jnp.imag(y_c),
                     jnp.real(ncov_c), jnp.imag(ncov_c), carry_last]
            sizes = [int(np.prod(p.shape)) for p in parts]
            g = coll.gather(
                jnp.concatenate([p.reshape(-1) for p in parts]),
                CHANNEL_AXIS, tiled=False)                   # [sc, sum]
            off = []
            o = 0
            for s_ in sizes:
                off.append((o, o + s_))
                o += s_
            yr = g[:, off[0][0]:off[0][1]].reshape(self.sc, *y_c.shape)
            yi = g[:, off[1][0]:off[1][1]].reshape(self.sc, *y_c.shape)
            y_full = jax.lax.complex(yr, yi)                 # [sc, ..., fsl]
            y_full = jnp.moveaxis(y_full, 0, -2).reshape(
                *y_c.shape[:-1], self.sc * y_c.shape[-1])[..., :f]
            nr = g[:, off[2][0]:off[2][1]].reshape(self.sc, *ncov_c.shape)
            ni = g[:, off[3][0]:off[3][1]].reshape(self.sc, *ncov_c.shape)
            ncov_full = jax.lax.complex(nr, ni).reshape(
                self.sc * ncov_c.shape[0], cdim_c, cdim_c)[:f]
            carry_full = g[:, off[4][0]:off[4][1]].reshape(self.sc * cl, lh)
            return y_full, ncov_full, carry_full

        cdim_c = c

        def mvdr_chain(pmean=None):
            """Covariance side of the chain with the merged time gather.
            Returns (covs_c, ncov_c, carry_last, pmean_all-or-None).  With
            channel shards the compute runs frequency-sharded (fshard);
            without, the original replicated full-F form — the merged
            time gather still carries the tail + aggregates."""
            spec_c = fslice(spectra) if fshard else spectra
            cov0_c = fslice(cov0, axis=0) if fshard else cov0
            ploc, dloc, pack = cov_local(spec_c)
            parts = [carry_tail_local, pack]
            if pmean is not None:
                parts.append(pmean)
            rows = time_merge(parts)
            carry_last = rows[0][-1].reshape(cl, lh)
            ag = rows[1]
            pmean_all = (rows[2].reshape(self.st * bl, -1)
                         if pmean is not None else None)
            covs_c, ncov_c = cov_complete(ploc, dloc, ag, cov0_c)
            if fshard:
                # pad bins (global index >= F) carry zero covariance; pin
                # them to the identity so the Cholesky stays finite (their
                # steering is zero, so the solve output is discarded)
                covs_c = covs_c + (pad_mask[None, :, None, None]
                                   * jnp.eye(c, dtype=covs_c.dtype))
            return covs_c, ncov_c, carry_last, pmean_all

        def mvdr_finish(covs_c, ncov_c, carry_last, steer_full):
            w = mvdr.weights_blocks(
                covs_c, fslice(steer_full) if fshard else steer_full,
                cfg.algo.diag_load)
            y_c = jax.vmap(mvdr.beamform)(
                fslice(spectra_blocks()) if fshard else spectra_blocks(), w)
            return channel_merge(y_c, ncov_c, carry_last)

        def resynth_stream(y):
            """y [..., Bl*T, F] → (out [Bl, ..., T*hop], tail): local OLA,
            spill ppermuted to the right time shard."""
            frames = stft_mod.istft_frames(y, self.win_s)
            full = overlap_add(frames, hop)                  # [..., BlT*hop+lh]
            o, tail = halo_mod.ola_tail_exchange(full, bt * hop,
                                                 state.ola_tail)
            o = o.reshape(*o.shape[:-1], bl, t * hop)
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
            power = pair_power()                             # [Bl*T, G]
            az, pk = srp.argmax_doa(power, self.srp_plan,
                                    interpolate=cfg.algo.srp_interpolate)
            out = {"doa": per_block(az), "power": per_block(pk)}

        elif algo == "srp_delaysum":
            power = pair_power()
            pmean = jnp.mean(power.reshape(bl, t, -1), axis=1)   # [Bl, G]
            gidx = jnp.argmax(pmean, axis=-1)
            steer_v = srp.steering_vector(self.srp_plan, gidx)   # [Bl, C, F]
            y = delaysum.beamform(spectra_blocks(), steer_v)
            out["audio"], new_tail = resynth_stream(
                y.reshape(bt, f))
            out["doa"] = jnp.asarray(self.srp_plan.azimuths_rad,
                                     jnp.float32)[gidx]

        elif algo == "mvdr":
            steer_v = jnp.broadcast_to(jnp.asarray(self.fixed_steer),
                                       (bl, *self.fixed_steer.shape))
            covs_c, ncov_c, carry_last, _ = mvdr_chain()
            y, new_cov, new_carry = mvdr_finish(covs_c, ncov_c, carry_last,
                                                steer_v)
            out["audio"], new_tail = resynth_stream(y.reshape(bt, f))

        elif algo == "srp_mvdr":
            power = pair_power()
            pmean = jnp.mean(power.reshape(bl, t, -1), axis=1)
            gidx = jnp.argmax(pmean, axis=-1)
            steer_v = srp.steering_vector(self.srp_plan, gidx)
            covs_c, ncov_c, carry_last, _ = mvdr_chain()
            y, new_cov, new_carry = mvdr_finish(covs_c, ncov_c, carry_last,
                                                steer_v)
            out["audio"], new_tail = resynth_stream(y.reshape(bt, f))
            out["doa"] = jnp.asarray(self.srp_plan.azimuths_rad,
                                     jnp.float32)[gidx]
            az_f, _ = srp.argmax_doa(power, self.srp_plan,
                                     interpolate=cfg.algo.srp_interpolate)
            out["doa_frame"] = per_block(az_f)

        elif algo == "track_mvdr":
            power = pair_power()
            pmean = jnp.mean(power.reshape(bl, t, -1), axis=1)   # [Bl, G]
            # tracking is a tiny strictly-sequential recursion across ALL
            # blocks: its [Bl, G] per-block surfaces ride the merged time
            # gather (with the carry tail + covariance aggregates) and the
            # scan runs replicated; each shard then steers only its own
            # blocks
            covs_c, ncov_c, carry_last, pmean_all = mvdr_chain(
                pmean=pmean)                                    # [B, G]
            az_grid = jnp.asarray(self.srp_plan.azimuths_rad, jnp.float32)

            if cfg.algo.smoother == "particle":
                def ptrack_step(ps, pm):
                    new_ps, doa, conf, gi = tracking.particle_track_block(
                        ps, pm, az_grid, self.suppress_bins,
                        cfg.algo.particle_step_std_rad,
                        cfg.algo.particle_resample_threshold)
                    return new_ps, (gi, doa, conf)

                new_particles, (gidx_all, angles, conf) = jax.lax.scan(
                    ptrack_step, state.particles, pmean_all)    # [B, S]
            else:
                def track_step(tr, pm):
                    new_tr, gi = tracking.track_block(
                        tr, pm, az_grid, self.suppress_bins,
                        cfg.algo.track_smooth)
                    return new_tr, (gi, new_tr.angles_rad, new_tr.confidence)

                new_tracks, (gidx_all, angles, conf) = jax.lax.scan(
                    track_step, state.tracks, pmean_all)        # [B, S]
            gidx = lax.dynamic_slice_in_dim(gidx_all, ti * bl, bl, axis=0)
            steer_v = srp.steering_vector(self.srp_plan, gidx)  # [Bl,S,C,F]
            y, new_cov, new_carry = mvdr_finish(covs_c, ncov_c, carry_last,
                                                steer_v)        # [Bl,S,T,F]
            y_s = jnp.moveaxis(y, 1, 0).reshape(y.shape[1], bt, f)
            out["audio"], new_tail = resynth_stream(y_s)
            out["doa"] = angles
            out["confidence"] = conf

        else:
            raise ValueError(f"unknown algo {algo!r}")

        new_cov_planes = (state.cov if new_cov is cov0 or new_cov is None
                          else cov_mod.to_planes(new_cov))
        new_state = PipelineState(carry=new_carry,
                                  block_idx=state.block_idx + bl * self.st,
                                  ola_tail=new_tail, cov=new_cov_planes,
                                  tracks=new_tracks,
                                  particles=new_particles)
        return new_state, out

    def _state_struct(self) -> PipelineState:
        """Pytree structure prototype (for building replicated PartitionSpecs)."""
        return self.init_state()

    # ------------------------------------------------------------------
    @property
    def frames_per_block(self) -> int:
        return self.cfg.frames_per_block

    def init_state(self) -> PipelineState:
        cfg = self.cfg
        c = self.geom.num_mics
        lh = cfg.stft.frame_len - cfg.stft.hop
        algo = cfg.algo.name
        ola_tail = None
        if algo in _SYNTH_ALGOS:
            shape = ((cfg.algo.num_sources, lh) if algo == "track_mvdr"
                     else (lh,))
            ola_tail = jnp.zeros(shape, jnp.float32)
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
        return PipelineState(carry=jnp.zeros((c, lh), jnp.float32),
                             block_idx=jnp.zeros((), jnp.int32),
                             ola_tail=ola_tail, cov=cov, tracks=tracks,
                             particles=particles)

    def process_block(self, state: PipelineState, samples) -> Tuple[
            PipelineState, Dict[str, jnp.ndarray]]:
        samples = jnp.asarray(samples, jnp.float32)
        if samples.shape != (self.geom.num_mics, self.cfg.block_len):
            raise ValueError(
                f"expected samples [{self.geom.num_mics}, {self.cfg.block_len}]"
                f", got {samples.shape}")
        return self._step(state, samples, *self._extra)

    def process_blocks(self, state: PipelineState, samples) -> Tuple[
            PipelineState, Dict[str, jnp.ndarray]]:
        """Throughput mode: B consecutive blocks in one dispatch.

        Default ("batched") shards the B blocks over the \'time\' mesh axis
        — each time shard runs the fused single-device batched math on its
        B/st consecutive blocks (see _local_blocks_batched); requires
        st | B.  scan_mode="scan" lax.scans the per-block shard_map step
        (the bit reference; frames sharded over time *within* each block).
        """
        samples = jnp.asarray(samples, jnp.float32)
        expect = (self.geom.num_mics, self.cfg.block_len)
        if samples.ndim != 3 or samples.shape[1:] != expect:
            raise ValueError(f"expected samples [B, {expect[0]}, {expect[1]}]"
                             f", got {list(samples.shape)}")
        if self.scan_mode == "batched":
            if samples.shape[0] % self.st:
                raise ValueError(
                    f"batched mode needs block count divisible by the "
                    f"{self.st} time shards, got {samples.shape[0]}")
            return self._many_batched(state, samples)
        return self._many(state, samples)

    # ------------------------------------------------------------------
    # The per-device body (runs under shard_map).
    # ------------------------------------------------------------------
    def _local_step(self, state: PipelineState, samples_local, *extra):
        cfg = self.cfg
        hop = cfg.stft.hop
        lh = cfg.stft.frame_len - hop
        c = self.geom.num_mics
        cl = c // self.sc
        ci = lax.axis_index(CHANNEL_AXIS)

        # ---- halo-extended local samples → local frames -> spectra ----
        # (stft_left_halo keeps the interior frames' DFT independent of the
        # halo ppermute so the scheduler overlaps comm with compute)
        carry_local = lax.dynamic_slice(state.carry, (ci * cl, 0), (cl, lh))
        new_carry = self._replicate_carry(samples_local[:, -lh:])
        spectra_local = halo_mod.stft_left_halo(
            samples_local, lh, carry_local, self.win_a, hop)     # [Cl, Tl, F]
        spectra = self._gather_channels(spectra_local)           # [C, Tl, F]

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
                # same multiband math as the batched path (frames are the
                # local time shard; per-frame outputs shard over 'time')
                res = gcc.gcc_phat_multiband(
                    spectra, self.pairs, self.gcc_plan, self._gcc_band_masks,
                    eps=cfg.algo.phat_eps, interpolate=cfg.algo.interpolate,
                    weighting=cfg.algo.gcc_weighting)
                out = {"tdoa": res["tdoa_fused"], "doa": res["doa_fused"],
                       "tdoa_band": res["tdoa"], "peak_band": res["peak"],
                       "peak": jnp.max(res["peak"], axis=0)}
            else:
                res = gcc.gcc_phat_block(spectra, self.pairs, self.gcc_plan,
                                         eps=cfg.algo.phat_eps,
                                         interpolate=cfg.algo.interpolate,
                                         weighting=cfg.algo.gcc_weighting)
                out = {"tdoa": res["tdoa"], "doa": res["doa"],
                       "peak": res["peak"]}

        elif algo == "delaysum":
            y = delaysum.beamform(spectra, jnp.asarray(self.fixed_steer))
            out["audio"], new_tail = self._resynth(y, state.ola_tail)

        elif algo == "srp_delaysum":
            power = self._srp_power(spectra, extra)
            pmean = dscan.psum_mean(power, TIME_AXIS)
            gidx = jnp.argmax(pmean, axis=-1)
            steer_v = srp.steering_vector(self.srp_plan, gidx)
            y = delaysum.beamform(spectra, steer_v)
            out["audio"], new_tail = self._resynth(y, state.ola_tail)
            out["doa"] = jnp.asarray(self.srp_plan.azimuths_rad,
                                     jnp.float32)[gidx]

        elif algo == "mask":
            y = masking.mask_block(spectra, jnp.asarray(self.mask_phase),
                                   cfg.algo.mask_threshold_rad,
                                   cfg.algo.mask_sharpness)
            out["audio"], new_tail = self._resynth(y, state.ola_tail)

        elif algo == "srp":
            power = self._srp_power(spectra, extra)              # [Tl, G]
            az, pk = srp.argmax_doa(power, self.srp_plan,
                                    interpolate=cfg.algo.srp_interpolate)
            out = {"doa": az, "power": pk}

        elif algo == "mvdr":
            new_cov = self._cov_update(cov, spectra)
            w = mvdr.weights(new_cov, jnp.asarray(self.fixed_steer),
                             cfg.algo.diag_load)
            out["audio"], new_tail = self._resynth(
                mvdr.beamform(spectra, w), state.ola_tail)

        elif algo == "srp_mvdr":
            power = self._srp_power(spectra, extra)
            pmean = dscan.psum_mean(power, TIME_AXIS)            # [G]
            gidx = jnp.argmax(pmean, axis=-1)
            steer_v = srp.steering_vector(self.srp_plan, gidx)
            new_cov = self._cov_update(cov, spectra)
            w = mvdr.weights(new_cov, steer_v, cfg.algo.diag_load)
            out["audio"], new_tail = self._resynth(
                mvdr.beamform(spectra, w), state.ola_tail)
            out["doa"] = jnp.asarray(self.srp_plan.azimuths_rad,
                                     jnp.float32)[gidx]
            out["doa_frame"], _ = srp.argmax_doa(
                power, self.srp_plan,
                interpolate=cfg.algo.srp_interpolate)

        elif algo == "track_mvdr":
            power = self._srp_power(spectra, extra)
            pmean = dscan.psum_mean(power, TIME_AXIS)
            az_grid = jnp.asarray(self.srp_plan.azimuths_rad, jnp.float32)
            if cfg.algo.smoother == "particle":
                # replicated state + replicated pmean ⇒ every shard runs the
                # same PRNG stream and lands on identical clouds
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
            steer_v = srp.steering_vector(self.srp_plan, gidx)   # [S, C, F]
            new_cov = self._cov_update(cov, spectra)
            w = mvdr.weights(new_cov, steer_v, cfg.algo.diag_load)
            out["audio"], new_tail = self._resynth(
                mvdr.beamform(spectra, w), state.ola_tail)
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

    # ---- collective helpers -------------------------------------------
    def _replicate_carry(self, carry_local):
        last = halo_mod.collect_last(carry_local, TIME_AXIS)
        if self.sc == 1:
            return last
        # invariant gather unconditionally: the carry is tiny ([C, lh]) and
        # the state out-spec claims replication, which vma must be able to
        # prove in guard mode
        return coll.all_gather_invariant(last, CHANNEL_AXIS, axis=0)

    def _gather_channels(self, spectra_local):
        if self.sc == 1:
            return spectra_local
        return coll.gather(spectra_local, CHANNEL_AXIS, axis=0, tiled=True)

    def _srp_power(self, spectra, extra):
        """Pair-sharded steered power: each channel shard handles its slice
        of mic pairs, partial powers psum over 'channel' (SURVEY.md §3.5).

        Fused backend: the shard's pair slice feeds the single-pass Pallas
        kernel directly (pair table via scalar prefetch, steering phases
        synthesised on-chip, valid column masks pad pairs) — the single-chip
        headline kernel survives scale-out instead of falling back to the
        materialised-CPS matmul (VERDICT round-2 missing item 2)."""
        plan = self.srp_plan
        if self._srp_fused:
            ptab_local, tau_local = extra
            sr, si = jnp.real(spectra), jnp.imag(spectra)
            if plan.band_mask is not None:
                mask = jnp.asarray(plan.band_mask)
                sr, si = sr * mask, si * mask
            partial = srp_fused.srp_power_fused(
                sr, si, ptab_local[:, :2], tau_local, plan.omega,
                len(plan.azimuths_rad), self.cfg.algo.phat_eps,
                valid=ptab_local[:, 2])
            return lax.psum(partial, CHANNEL_AXIS)
        pairs_local, e_re_local, e_im_local = extra
        gp = _cps_phat_dyn(spectra, pairs_local, self.cfg.algo.phat_eps)
        pl_, f, grid = e_re_local.shape
        partial = ksteer.srp_power(gp, e_re_local.reshape(pl_ * f, grid),
                                   e_im_local.reshape(pl_ * f, grid))
        return lax.psum(partial, CHANNEL_AXIS)

    def _cov_update(self, cov, spectra):
        decay, partial = cov_mod.block_stats(spectra, self.cfg.algo.cov_forget)
        decay, partial = dscan.combine_cov_partials(decay, partial, TIME_AXIS)
        return cov * decay.astype(cov.dtype) + partial

    def _resynth(self, y, tail):
        hop = self.cfg.stft.hop
        frames = stft_mod.istft_frames(y, self.win_s)            # [..., Tl, L]
        full = overlap_add(frames, hop)
        t_local = frames.shape[-2]
        return halo_mod.ola_tail_exchange(full, t_local * hop, tail)


def _cps_phat_dyn(spectra: jnp.ndarray, pairs: jnp.ndarray,
                  eps: float) -> jnp.ndarray:
    """cps_phat with a *traced* pair-index array (the per-device pair slice
    arrives as a shard_map operand, not a host constant)."""
    a = jnp.take(spectra, pairs[:, 0], axis=-3)
    b = jnp.take(spectra, pairs[:, 1], axis=-3)
    g = a * jnp.conj(b)
    return g / (jnp.abs(g) + jnp.asarray(eps, jnp.float32))
