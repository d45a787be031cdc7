"""Jit-boundary dtype invariant: no complex leaves cross the host<->device
boundary.

Complex64 is an internal representation only (mcax.algos.covariance.to_planes
docstring): some TPU runtimes implement neither complex transfers nor complex
program inputs/outputs, and a complex leaf in the streaming state would also
leak into checkpoints.  Every pipeline's state pytree and output dict must be
real-valued for all five acceptance configs — this is what lets the chain
run at all on such backends, so it is pinned as a test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcax.config import get_config
from mcax.pipeline import Pipeline

CONFIGS = ["config1", "config2", "config3", "config4", "config5"]


def _assert_real_tree(tree, what):
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        assert not jnp.iscomplexobj(leaf), (
            f"complex leaf at {what}{jax.tree_util.keystr(path)}: "
            f"{leaf.dtype} — complex must stay internal to the jitted step")


@pytest.mark.parametrize("name", CONFIGS)
def test_state_and_outputs_real(name):
    cfg = get_config(name)
    pipe = Pipeline(cfg, jit=False)
    state = pipe.init_state()
    _assert_real_tree(state, f"{name} init_state")
    samples = jnp.asarray(np.random.default_rng(0).standard_normal(
        (pipe.geom.num_mics, cfg.block_len)), jnp.float32)
    state, out = pipe._block_step(state, samples)
    _assert_real_tree(state, f"{name} state")
    _assert_real_tree(out, f"{name} out")


def test_cov_planes_round_trip():
    from mcax.algos import covariance as cov
    rng = np.random.default_rng(3)
    z = jnp.asarray((rng.standard_normal((5, 4, 4)) +
                     1j * rng.standard_normal((5, 4, 4))).astype(np.complex64))
    back = cov.from_planes(cov.to_planes(z))
    np.testing.assert_array_equal(np.asarray(jnp.real(back)),
                                  np.asarray(jnp.real(z)))
    np.testing.assert_array_equal(np.asarray(jnp.imag(back)),
                                  np.asarray(jnp.imag(z)))
    p = cov.init_planes(5, 4, scale=2.0)
    assert p.dtype == jnp.float32 and p.shape == (5, 4, 4, 2)
    np.testing.assert_array_equal(
        np.asarray(cov.from_planes(p)),
        np.broadcast_to(np.eye(4, dtype=np.complex64) * 2.0, (5, 4, 4)))
