"""CLI runner + parity tool end-to-end (components C12/C15/C16)."""

import os

import numpy as np
import pytest

from mcax import config as cfg_mod
from mcax.cli import run as cli_run
from mcax.io.wav import read_wav, write_wav
from tests import helpers

import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "tools"))
import parity as parity_tool  # noqa: E402


def _wav_for(name, tmp, az_deg=40.0, nblocks=3, seed=0):
    cfg = cfg_mod.get_config(name)
    g = cfg.geometry()
    x = helpers.array_signals(g, np.deg2rad(az_deg), cfg.block_len * nblocks,
                              seed=seed)
    path = os.path.join(tmp, f"{name}.wav")
    write_wav(path, cfg.sample_rate, x)
    return path, cfg


def test_cli_gcc_writes_doa_csv(tmp_path):
    path, cfg = _wav_for("config1", str(tmp_path), az_deg=60.0)
    doa = os.path.join(tmp_path, "doa.csv")
    metrics = os.path.join(tmp_path, "m.jsonl")
    rc = cli_run.main([path, "--config", "config1", "--doa-out", doa,
                       "--metrics", metrics])
    assert rc == 0
    rows = open(doa).read().strip().splitlines()
    assert rows[0] == "block,frame_or_source,doa_deg,score"
    assert len(rows) > cfg.frames_per_block          # per-frame rows
    assert os.path.getsize(metrics) > 0


def test_cli_delaysum_writes_wav(tmp_path):
    path, cfg = _wav_for("config2", str(tmp_path))
    out = os.path.join(tmp_path, "out.wav")
    rc = cli_run.main([path, "--config", "config2", "--wav-out", out])
    assert rc == 0
    rate, audio = read_wav(out)
    assert rate == cfg.sample_rate
    assert audio.shape[-1] == cfg.block_len * 3


def test_cli_channel_mismatch_errors(tmp_path):
    path, _ = _wav_for("config1", str(tmp_path))    # 2-channel wav
    rc = cli_run.main([path, "--config", "config3"])  # needs 8
    assert rc == 2


def test_cli_checkpoint_roundtrip(tmp_path):
    path, cfg = _wav_for("config1", str(tmp_path))
    ck = os.path.join(tmp_path, "ck.npz")
    rc = cli_run.main([path, "--config", "config1", "--checkpoint", ck,
                       "--checkpoint-every", "1", "--max-blocks", "2"])
    assert rc == 0 and os.path.exists(ck)
    # resume completes the remaining block without error
    rc = cli_run.main([path, "--config", "config1", "--checkpoint", ck,
                       "--resume"])
    assert rc == 0


def test_parity_tool_pass_and_fail(tmp_path):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((1, 8000)).astype(np.float32) * 0.3
    pa = os.path.join(tmp_path, "a.wav")
    pb = os.path.join(tmp_path, "b.wav")
    pc = os.path.join(tmp_path, "c.wav")
    write_wav(pa, 16000, a, dtype=np.float32)
    write_wav(pb, 16000, a + 1e-4 * rng.standard_normal(a.shape).astype(np.float32),
              dtype=np.float32)
    write_wav(pc, 16000, rng.standard_normal(a.shape).astype(np.float32) * 0.3,
              dtype=np.float32)
    assert parity_tool.main(["--wav", pa, pb, "--snr-db", "40"]) == 0
    assert parity_tool.main(["--wav", pa, pc, "--snr-db", "40"]) == 1


def test_parity_tool_doa(tmp_path):
    pa = os.path.join(tmp_path, "a.csv")
    pb = os.path.join(tmp_path, "b.csv")
    hdr = "block,frame_or_source,doa_deg,score\n"
    with open(pa, "w") as f:
        f.write(hdr + "0,0,10.0,1\n0,1,-179.0,1\n")
    with open(pb, "w") as f:
        f.write(hdr + "0,0,11.0,1\n0,1,179.0,1\n")   # wraps: 2 deg apart
    assert parity_tool.doa_error_deg(pa, pb) == pytest.approx(1.5)
    assert parity_tool.main(["--doa", pa, pb, "--max-deg", "2"]) == 0

def test_check_reference_drill():
    """The reference-arrival drill (VERDICT round-2 item 10): the readiness
    check runs in CI and exits 0 whether or not /root/reference is
    populated; the day it fills, its report flips populated=true and the
    round starts with SURVEY §2b re-verification + COPYCHECK + parity."""
    import json
    import subprocess
    tool = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "tools",
        "check_reference.py")
    proc = subprocess.run([sys.executable, tool], capture_output=True,
                          text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr
    report = json.loads(proc.stdout)
    assert "populated" in report


def test_config_overrides():
    cfg = cfg_mod.apply_overrides(cfg_mod.get_config("config1"),
                          ["algo.gcc_bands=4", "block_len=8192",
                           "algo.band_hz=300,3400", "algo.interpolate=false"])
    assert cfg.algo.gcc_bands == 4
    assert cfg.block_len == 8192
    assert cfg.algo.band_hz == (300.0, 3400.0)
    assert cfg.algo.interpolate is False
    with pytest.raises(ValueError):
        cfg_mod.apply_overrides(cfg, ["algo.not_a_field=1"])
    with pytest.raises(ValueError):
        cfg_mod.apply_overrides(cfg, ["algo.gcc_bands"])


def test_cli_set_override(tmp_path):
    """--set flows into the pipeline: gcc with 3 sub-bands end to end."""
    cfg = cfg_mod.get_config("config1")
    g = cfg.geometry()
    x = helpers.array_signals(g, np.deg2rad(30.0), cfg.block_len * 2, seed=4)
    wav_path = tmp_path / "in.wav"
    write_wav(str(wav_path), cfg.sample_rate, x)
    doa_path = tmp_path / "doa.csv"
    rc = cli_run.main([str(wav_path), "--config", "config1",
                   "--set", "algo.gcc_bands=3",
                   "--doa-out", str(doa_path)])
    assert rc == 0
    rows = doa_path.read_text().strip().splitlines()
    assert len(rows) > 1          # header + per-frame rows


def test_cli_srp_delaysum_writes_doa_rows(tmp_path):
    """The srp_delaysum chain emits one DOA row per block (VERDICT round-2
    weak item 4: this path used to yield a header-only CSV)."""
    path, cfg = _wav_for("config3", str(tmp_path), az_deg=55.0, nblocks=2)
    doa = os.path.join(tmp_path, "doa.csv")
    out = os.path.join(tmp_path, "out.wav")
    rc = cli_run.main([path, "--config", "config3",
                       "--set", "algo.name=srp_delaysum",
                       "--set", "stft.synthesis=true",
                       "--doa-out", doa, "--wav-out", out])
    assert rc == 0
    rows = open(doa).read().strip().splitlines()
    assert len(rows) == 1 + 2                     # header + one row per block
    est = float(rows[-1].split(",")[2])
    assert abs(est - 55.0) < 5.0, est


def test_cli_blocks_per_dispatch_matches_per_block(tmp_path):
    """--blocks-per-dispatch N drives process_blocks (one dispatch per N
    blocks, tail flushed block-wise) and matches the N=1 stream (VERDICT
    round-1 item 8: the device-side N-block streaming loop)."""
    path, cfg = _wav_for("config2", str(tmp_path), az_deg=25.0, nblocks=5)
    outs = []
    for n in ("1", "2"):
        wav_out = os.path.join(tmp_path, f"out{n}.wav")
        rc = cli_run.main([path, "--config", "config2", "--wav-out", wav_out,
                           "--blocks-per-dispatch", n])
        assert rc == 0
        outs.append(read_wav(wav_out)[1])
    assert outs[0].shape == outs[1].shape
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-4)


def test_cli_mesh_end_to_end(tmp_path):
    """--mesh TxC reaches ShardedPipeline through the CLI wiring and still
    localises the injected source (VERDICT.md round-1 weak item 7)."""
    path, cfg = _wav_for("config3", str(tmp_path), az_deg=-75.0, nblocks=2)
    doa = os.path.join(tmp_path, "doa.csv")
    rc = cli_run.main([path, "--config", "config3", "--doa-out", doa,
                       "--mesh", "2x4"])
    assert rc == 0
    rows = open(doa).read().strip().splitlines()[1:]
    vals = [float(r.split(",")[2]) for r in rows]
    est = np.median(vals[len(vals) // 2:])
    assert abs(est - (-75.0)) < 2.0, est


def test_cli_pipelined_matches_sync(tmp_path):
    """--pipeline-depth K>1 (fetch one group late, SURVEY.md §7.4) must be
    bit-identical to the fully synchronous loop: same WAV, same DOA rows,
    and checkpoints still land with their outputs."""
    path, cfg = _wav_for("config2", str(tmp_path), nblocks=6)
    outs, doas = [], []
    for depth in (1, 3):
        out = os.path.join(tmp_path, f"out_d{depth}.wav")
        doa = os.path.join(tmp_path, f"doa_d{depth}.csv")
        ck = os.path.join(tmp_path, f"ck_d{depth}.npz")
        rc = cli_run.main([path, "--config", "config2", "--wav-out", out,
                           "--doa-out", doa, "--pipeline-depth", str(depth),
                           "--blocks-per-dispatch", "2",
                           "--checkpoint", ck, "--checkpoint-every", "2"])
        assert rc == 0
        assert os.path.exists(ck)
        outs.append(read_wav(out)[1])
        doas.append(open(doa).read())
    np.testing.assert_array_equal(outs[0], outs[1])
    assert doas[0] == doas[1]
