"""The examples/ scripts run end-to-end and recover their injected scenes
(kept honest the same way the reference's demo binaries were exercised by
its test WAVs)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "repo", "examples"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "examples"))


def test_localize_example():
    import localize
    est = localize.main(az_deg=40.0, nblocks=4)
    assert abs(est - 40.0) < 3.0, est


def test_beamform_example(tmp_path):
    import beamform_mvdr
    out = str(tmp_path / "out.wav")
    audio = beamform_mvdr.main(out, nblocks=2)
    assert os.path.exists(out)
    assert np.all(np.isfinite(audio))


@pytest.mark.skipif("JAX_PLATFORMS" not in os.environ
                    and os.environ.get("MCAX_TEST_PLATFORM", "cpu") != "cpu",
                    reason="needs the virtual multi-device mesh")
def test_sharded_example():
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("single device")
    import sharded_mesh
    doa = sharded_mesh.main(nblocks=4)
    assert abs(doa - (-75.0)) < 3.0, doa


def test_throughput_example():
    import throughput
    sps = throughput.main(batch=4, dispatches=2, config="config1")
    assert np.isfinite(sps) and sps > 0
