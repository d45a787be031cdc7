"""process_blocks (lax.scan throughput mode) bit-matches the block loop."""

import numpy as np
import pytest

from mcax import config as cfg_mod
from mcax.pipeline import Pipeline
from tests import helpers


@pytest.mark.parametrize("name,key", [("config1", "tdoa"),
                                      ("config3", "doa"),
                                      ("config4", "audio")])
def test_scan_matches_loop(name, key):
    cfg = cfg_mod.get_config(name)
    g = cfg.geometry()
    nb = 3
    x = helpers.array_signals(g, np.deg2rad(20.0), cfg.block_len * nb, seed=0)
    blocks = x.reshape(g.num_mics, nb, cfg.block_len).transpose(1, 0, 2)

    pipe = Pipeline(cfg, donate=False)
    st = pipe.init_state()
    loop_outs = []
    for b in range(nb):
        st, out = pipe.process_block(st, blocks[b])
        loop_outs.append(np.asarray(out[key]))

    st2 = pipe.init_state()
    st2, outs = pipe.process_blocks(st2, blocks)
    scanned = np.asarray(outs[key])
    assert scanned.shape[0] == nb
    for b in range(nb):
        np.testing.assert_allclose(scanned[b], loop_outs[b], atol=2e-5,
                                   rtol=2e-5)
    np.testing.assert_allclose(np.asarray(st2.carry), np.asarray(st.carry),
                               atol=1e-6)


def test_scan_shape_validation():
    cfg = cfg_mod.get_config("config1")
    pipe = Pipeline(cfg)
    with pytest.raises(ValueError, match="expected samples"):
        pipe.process_blocks(pipe.init_state(),
                            np.zeros((2, cfg.block_len), np.float32))
