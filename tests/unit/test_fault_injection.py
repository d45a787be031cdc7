"""Fault injection: SIGKILL a streaming run mid-stream, resume from its
checkpoint, and require the resumed output to bit-match an uninterrupted
run (SURVEY.md §5 failure detection / checkpoint-resume)."""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from mcax import config as cfg_mod
from mcax.io.wav import write_wav
from tests import helpers

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNNER = r"""
import os, sys
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from mcax.cli import run as cli_run
sys.exit(cli_run.main({argv!r}))
"""


def _spawn(argv):
    code = RUNNER.format(repo=REPO, argv=argv)
    return subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)


@pytest.mark.timeout(300)
def test_sigkill_then_resume_bit_identical(tmp_path):
    cfg = cfg_mod.get_config("config2")
    g = cfg.geometry()
    nblocks = 24
    x = helpers.array_signals(g, np.pi / 2, cfg.block_len * nblocks, seed=0)
    wav = os.path.join(tmp_path, "in.wav")
    write_wav(wav, cfg.sample_rate, x)

    ref_out = os.path.join(tmp_path, "ref.wav")
    p = _spawn([wav, "--config", "config2", "--wav-out", ref_out])
    assert p.wait(timeout=240) == 0

    # interrupted run: kill -9 as soon as a checkpoint appears
    ck = os.path.join(tmp_path, "ck.npz")
    kill_out = os.path.join(tmp_path, "killed.wav")
    p = _spawn([wav, "--config", "config2", "--wav-out", kill_out,
                "--checkpoint", ck, "--checkpoint-every", "4",
                "--throttle", "0.15"])
    deadline = time.time() + 240
    while not os.path.exists(ck) and time.time() < deadline:
        if p.poll() is not None:
            break
        time.sleep(0.2)
    if p.poll() is None:
        p.send_signal(signal.SIGKILL)
        p.wait()
    assert os.path.exists(ck), "no checkpoint was written before the kill"

    # resumed run completes and the full output matches the reference run.
    # (The killed process never wrote its partial WAV; the resumed run
    # re-emits only post-checkpoint blocks, so splice cursor-aligned audio.)
    res_out = os.path.join(tmp_path, "resumed.wav")
    p = _spawn([wav, "--config", "config2", "--wav-out", res_out,
                "--checkpoint", ck, "--resume"])
    assert p.wait(timeout=240) == 0

    from mcax.io.wav import read_wav
    _, ref = read_wav(ref_out)
    _, res = read_wav(res_out)
    import json
    with np.load(ck) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
    # the checkpoint's cursor was advanced by the final save of the resumed
    # run; the resumed audio is the tail of the reference run
    n_res = res.shape[-1]
    np.testing.assert_array_equal(res, ref[:, ref.shape[-1] - n_res:])
    assert n_res < ref.shape[-1]          # it genuinely resumed, not re-ran
