"""Exact distributed recursions across time shards (SURVEY.md §5, §7.4).

The recursive spatial covariance  R <- lam R + (1-lam) x x^H  composed over a
block has the closed form  R_out = d R_in + p  with the monoid

    (d2, p2) . (d1, p1) = (d1*d2, d2*p1 + p2)        (1 happens first)

so S time shards each compute their local (d_s, p_s) (covariance.block_stats)
and the block's total is the ordered product — computed here from one
all_gather of the tiny (d, p) pairs, bit-stable w.r.t. shard count because
the weighted sum is evaluated in a fixed order on every device.  This is the
associative-scan combine of SURVEY.md §5 "long-context", specialised to the
"only the final R matters within a block" case the pipeline needs.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from mcax.dist.mesh import TIME_AXIS


def combine_cov_partials(decay_local: jnp.ndarray, partial_local: jnp.ndarray,
                         axis: str = TIME_AXIS):
    """Combine per-shard covariance stats over the time axis.

    Args:
      decay_local: scalar float32, this shard's lambda^{T_local}.
      partial_local: [F, C, C] complex64 partial sum.
    Returns:
      (decay_total, partial_total) replicated over the axis such that
      R_new = decay_total * R_old + partial_total exactly equals the
      single-device sequential recursion over all shards in time order.
    """
    n = lax.axis_size(axis)
    if n == 1:
        return decay_local, partial_local
    from mcax.dist import collectives as coll
    d = coll.gather(decay_local, axis, tiled=False)        # [S]
    p = coll.gather(partial_local, axis, tiled=False)      # [S, F, C, C]
    # w_s = prod_{j > s} d_j  (later shards' decay applied to earlier partials)
    suffix = jnp.cumprod(d[::-1])[::-1]                    # [S], suffix[s] = prod_{j>=s}
    w = jnp.concatenate([suffix[1:], jnp.ones((1,), d.dtype)])
    partial_total = jnp.einsum("s,sfcd->fcd", w.astype(p.dtype), p)
    return jnp.prod(d), partial_total


def psum_mean(x_local: jnp.ndarray, axis: str, axis_count_weight: int = 1):
    """Mean over a sharded leading axis: psum of local sums / global count."""
    total = lax.psum(jnp.sum(x_local, axis=0), axis)
    count = lax.psum(jnp.asarray(x_local.shape[0], jnp.float32), axis)
    return total / count
