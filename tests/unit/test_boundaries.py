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
    samples = np.random.default_rng(0).standard_normal(
        (pipe.geom.num_mics, cfg.block_len)).astype(np.float32)
    # eval_shape: the dtype invariant is a TRACE property — checking it
    # abstractly needs no device execution, so the test also runs on
    # backends whose eager complex ops are unimplemented (axon)
    state, out = jax.eval_shape(pipe._block_step, state,
                                jax.ShapeDtypeStruct(samples.shape,
                                                     jnp.float32))
    _assert_real_tree(state, f"{name} state")
    _assert_real_tree(out, f"{name} out")


def test_cov_planes_round_trip():
    from mcax.algos import covariance as cov
    from tests import helpers
    rng = np.random.default_rng(3)
    z = (rng.standard_normal((5, 4, 4)) +
         1j * rng.standard_normal((5, 4, 4))).astype(np.complex64)
    back = helpers.run_planes(
        lambda zz: cov.from_planes(cov.to_planes(zz)), z)
    np.testing.assert_array_equal(back.real, z.real)
    np.testing.assert_array_equal(back.imag, z.imag)
    p = cov.init_planes(5, 4, scale=2.0)
    assert p.dtype == jnp.float32 and p.shape == (5, 4, 4, 2)
    eye = helpers.run_planes(lambda pp: cov.from_planes(pp), np.asarray(p))
    np.testing.assert_array_equal(
        eye, np.broadcast_to(np.eye(4, dtype=np.complex64) * 2.0, (5, 4, 4)))
