"""CLI runner for the five acceptance configs (components C12/C16).

The TPU-native equivalent of the reference's demo binaries (WAV in → module
→ callback out):

    python -m mcax.cli.run --config config3 in.wav --doa-out doa.csv
    python -m mcax.cli.run --config config4 in.wav --wav-out out.wav \
        --metrics metrics.jsonl --mesh 2x4 --checkpoint ck.npz --resume

Streams fixed-size blocks through the jitted pipeline (single-device or
sharded over a ('time','channel') mesh), writes the DOA stream as CSV (the
reference's localisation-callback equivalent), beamformed audio as WAV, and
per-block metrics as JSONL.  ``--checkpoint``/``--resume`` snapshot the full
streaming state pytree so an interrupted run resumes bit-identically.
"""

from __future__ import annotations

import argparse
import logging
import sys
import time
from typing import Optional

import jax
import numpy as np

from mcax import config as cfg_mod
from mcax.io import wav as wav_io
from mcax.utils import checkpoint as ckpt
from mcax.utils.metrics import JsonlWriter, log


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="mcax.cli.run",
        description="Run a multichannel acoustic-array pipeline over a WAV.")
    p.add_argument("input", help="multichannel WAV input")
    p.add_argument("--config", default="config1",
                   choices=sorted(cfg_mod.PRESETS),
                   help="acceptance preset (BASELINE.json)")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="SECTION.FIELD=VALUE",
                   help="override any config field (repeatable), e.g. "
                        "--set algo.gcc_bands=5 --set stft.hop=128")
    p.add_argument("--doa-out", default=None, help="DOA stream CSV path")
    p.add_argument("--wav-out", default=None, help="beamformed audio WAV path")
    p.add_argument("--metrics", default=None, help="per-block JSONL metrics")
    p.add_argument("--mesh", default=None, metavar="TxC",
                   help="shard over a mesh, e.g. 2x4 = 2 time x 4 channel")
    p.add_argument("--checkpoint", default=None, help="state snapshot path")
    p.add_argument("--checkpoint-every", type=int, default=50,
                   metavar="BLOCKS")
    p.add_argument("--resume", action="store_true",
                   help="resume from --checkpoint if it exists")
    p.add_argument("--max-blocks", type=int, default=None)
    p.add_argument("--blocks-per-dispatch", type=int, default=4,
                   metavar="N",
                   help="group N consecutive blocks into one device "
                        "dispatch (process_blocks).  N>1 amortises the "
                        "per-dispatch host round-trip (the latency floor on "
                        "tunneled/remote backends, see PERF.md) at the cost "
                        "of N blocks of output latency; N=1 is the "
                        "lowest-latency per-block path")
    p.add_argument("--throttle", type=float, default=0.0, metavar="SECONDS",
                   help="sleep after each block (simulate a real-time feed)")
    p.add_argument("--pipeline-depth", type=int, default=2, metavar="K",
                   help="keep K dispatch groups in flight, fetching group "
                        "i's results while group i+1..i+K-1 compute "
                        "(SURVEY.md §7.4 'fetch results one block late'). "
                        "K=1 restores the fully synchronous loop; the "
                        "output/DOA stream lags the input by (K-1) groups")
    p.add_argument("-v", "--verbose", action="store_true")
    return p


def _make_pipeline(cfg, mesh_arg: Optional[str]):
    if mesh_arg:
        from mcax.dist import mesh as mesh_mod
        from mcax.dist.sharded import ShardedPipeline
        ts, cs = (int(v) for v in mesh_arg.lower().split("x"))
        return ShardedPipeline(cfg, mesh_mod.make_mesh(ts, cs))
    from mcax.pipeline import Pipeline
    return Pipeline(cfg)


def _doa_rows(name: str, out, cfg, block: int):
    """Yield (block, frame_or_source, doa_deg, score) rows per config."""
    if name == "gcc":
        doa = np.rad2deg(np.asarray(out["doa"]))[0]          # pair 0, [T]
        peak = np.asarray(out["peak"])[0]
        for t in range(doa.shape[0]):
            yield block, t, float(doa[t]), float(peak[t])
    elif name == "srp":
        doa = np.rad2deg(np.asarray(out["doa"]))
        power = np.asarray(out["power"])
        for t in range(doa.shape[0]):
            yield block, t, float(doa[t]), float(power[t])
    elif name in ("srp_mvdr", "srp_delaysum"):
        yield block, -1, float(np.rad2deg(np.asarray(out["doa"]))), 0.0
    elif name == "track_mvdr":
        doa = np.rad2deg(np.asarray(out["doa"]))
        conf = np.asarray(out["confidence"])
        for s in range(doa.shape[0]):
            yield block, s, float(doa[s]), float(conf[s])


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.DEBUG if args.verbose else logging.INFO,
                        format="%(levelname)s mcax: %(message)s")
    cfg = cfg_mod.apply_overrides(cfg_mod.get_config(args.config),
                                  args.overrides)
    from mcax.io import stream as stream_mod
    rate, total_frames, channels = wav_io.wav_info(args.input)
    c_need = cfg.array.num_mics
    if channels != c_need:
        log.error("config %s needs %d channels, %s has %d",
                  cfg.name, c_need, args.input, channels)
        return 2
    if rate != cfg.sample_rate:
        log.warning("WAV rate %d != config rate %d; samples are treated as "
                    "%d Hz (no resampling)", rate, cfg.sample_rate,
                    cfg.sample_rate)

    pipe = _make_pipeline(cfg, args.mesh)
    state = pipe.init_state()
    start_block = 0
    nblocks = -(-total_frames // cfg.block_len)
    if args.max_blocks is not None:
        nblocks = min(nblocks, args.max_blocks)

    if args.resume and args.checkpoint:
        try:
            state, cursor, _ = ckpt.load(args.checkpoint, state,
                                         cfg.config_hash())
            start_block = cursor // cfg.block_len
            log.info("resumed from %s at block %d", args.checkpoint,
                     start_block)
        except FileNotFoundError:
            log.info("no checkpoint at %s; starting fresh", args.checkpoint)

    doa_f = open(args.doa_out, "w") if args.doa_out else None
    if doa_f:
        doa_f.write("block,frame_or_source,doa_deg,score\n")
    metrics = JsonlWriter(args.metrics)
    audio_parts = []
    algo = cfg.algo.name

    bpd = max(1, args.blocks_per_dispatch)
    ckpts_done = 0

    def _dispatch(group, state):
        """Dispatch a group of consecutive blocks WITHOUT fetching results.

        A full group of ``bpd`` blocks goes through ``process_blocks`` (one
        device dispatch; out leaves gain a leading B axis); a single block —
        including each block of a short final tail, dispatched one at a time
        so the jitted [bpd, C, L] shape never retraces — goes through
        ``process_block``.  The per-dispatch round-trip is paid once per
        ``bpd`` blocks; the returned outputs are device futures whose fetch
        the caller pipelines (_emit) so the host↔device round-trip of group
        i overlaps group i+1's compute (SURVEY.md §7.4; VERDICT r3 item 4).
        """
        idxs = [b for b, _ in group]
        if len(idxs) == 1:
            state, out = pipe.process_block(state, group[0][1])
        else:
            state, out = pipe.process_blocks(
                state, np.stack([blk for _, blk in group]))
        return state, (idxs, out, time.perf_counter())

    def _emit(inflight):
        """Fetch one in-flight group's outputs and write its rows."""
        idxs, out, t_dispatch = inflight
        n = len(idxs)
        if n == 1:
            outs = [jax.tree.map(np.asarray, out)]
        else:
            host = jax.tree.map(np.asarray, out)
            outs = [jax.tree.map(lambda x, i=i: x[i], host)
                    for i in range(n)]
        done = time.perf_counter()
        per_block = (done - t_dispatch) / n
        audio_s = cfg.block_len / cfg.sample_rate
        for b, o in zip(idxs, outs):
            if "audio" in o:
                audio_parts.append(np.asarray(o["audio"]))
            rec = {"block": b, "latency_s": round(per_block, 6),
                   "realtime_factor": round(audio_s / per_block, 2)
                   if per_block > 0 else 0.0}
            if doa_f:
                for row in _doa_rows(algo, o, cfg, b):
                    doa_f.write(",".join(str(v) for v in row) + "\n")
            if "doa" in o:
                rec["doa_deg"] = np.round(
                    np.rad2deg(np.asarray(o["doa"])), 2).tolist()
            metrics.write(rec)
        return idxs[-1]

    # Checkpoint planning is DISPATCH-side (ckpts_planned) while the save
    # itself is EMIT-side (ckpts_done): with pipeline depth >= 2, testing
    # against the emit-side counter would let two in-flight groups both
    # see the same stale count, both take the (blocking, pipelining-
    # defeating) state snapshot, and save the same boundary twice
    # (ADVICE r4).
    ckpts_planned = 0

    def _ckpt_due(last_b) -> bool:
        done = last_b + 1 - start_block
        return bool(args.checkpoint
                    and done // args.checkpoint_every > ckpts_planned)

    # double-buffered streaming feeder: the native (or scipy-fallback) reader
    # runs on a producer thread so disk I/O overlaps device compute
    blocks = stream_mod.prefetched(
        stream_mod.block_iterator(args.input, cfg.block_len, c_need))
    pending = []
    depth = max(1, args.pipeline_depth)
    # in-flight dispatch groups: (idxs, device outs, host state snap, t0).
    # When a group is checkpoint-due, its post-group state is materialised
    # to host at dispatch time (the device buffers are donated to the NEXT
    # dispatch, so they cannot be fetched later); the save itself happens
    # at emit time, after the group's rows are written, so a crash
    # mid-pipeline re-runs only unemitted groups on resume.
    from collections import deque
    inflight: "deque" = deque()

    def _push(group, state):
        nonlocal ckpts_planned
        state, (idxs, out, t0) = _dispatch(group, state)
        # start the device->host copies NOW so they overlap the next
        # group's compute; the blocking np.asarray at emit time then
        # completes from the host staging buffer.  (Measured r4: without
        # this, dispatch and fetch each cost a full tunnel round-trip on
        # the host thread and pipelining gains nothing.)
        for leaf in jax.tree_util.tree_leaves(out):
            try:
                leaf.copy_to_host_async()
            except (AttributeError, RuntimeError):
                break                     # backend without async copies
        snap = (jax.tree.map(np.asarray, state)
                if _ckpt_due(idxs[-1]) else None)
        if snap is not None:
            ckpts_planned = ((idxs[-1] + 1 - start_block)
                             // args.checkpoint_every)
        inflight.append((idxs, out, snap, t0))
        if len(inflight) >= depth:
            _pop()
        return state

    def _pop():
        nonlocal ckpts_done
        idxs, out, snap, t0 = inflight.popleft()
        last_b = _emit((idxs, out, t0))
        if snap is not None:
            ckpts_done = (last_b + 1 - start_block) // args.checkpoint_every
            ckpt.save(args.checkpoint, snap, cfg.config_hash(),
                      sample_cursor=(last_b + 1) * cfg.block_len)

    try:
        for b, blk in enumerate(blocks):
            if b >= nblocks:
                break
            if b < start_block:                   # resume: skip finished blocks
                continue
            pending.append((b, blk))
            if len(pending) == bpd:
                state = _push(pending, state)
                pending = []
                if args.throttle > 0:
                    time.sleep(args.throttle)
        for tail in pending:                      # tail shorter than bpd
            state = _push([tail], state)
        while inflight:                           # drain the pipeline
            _pop()
        if args.checkpoint:
            ckpt.save(args.checkpoint, state, cfg.config_hash(),
                      sample_cursor=nblocks * cfg.block_len)
    finally:
        if doa_f:
            doa_f.close()
        metrics.close()

    if audio_parts and args.wav_out:
        audio = np.concatenate(audio_parts, axis=-1)
        wav_io.write_wav(args.wav_out, cfg.sample_rate, audio)
        log.info("wrote %s (%s samples)", args.wav_out, audio.shape[-1])
    elif args.wav_out:
        log.warning("config %s produces no audio output", cfg.name)
    return 0


if __name__ == "__main__":
    sys.exit(main())
