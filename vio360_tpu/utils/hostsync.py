"""Batched device->host reads for dispatch-latency environments.

``jax.device_get`` of a pytree fetches each leaf with its own
round trip; through a tunneled-TPU relay each round trip costs
~5-60 ms (measured round 4), so a 10-leaf diagnostic dict costs ~10x
a single packed array. ``fetch_tree`` concatenates every leaf into ONE
f32 vector inside a tiny jitted program (dispatch is async and ~free),
fetches that single array, and re-splits on the host.

This is the host-side twin of estimator/fused.py's design rule: one
dispatch, one transfer per decision point. int/bool leaves round-trip
through f32 — exact for |values| < 2^24 (feature ids, counts, frame
ids; asserted nowhere because every caller is in that regime by
construction).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .precision import jit as _pjit


@_pjit
def _pack(leaves: list):
    return jnp.concatenate(
        [jnp.ravel(x).astype(jnp.float32) for x in leaves]
    )


def fetch_tree(tree):
    """Fetch an arbitrary pytree of device arrays with ONE transfer.

    Returns the same structure with numpy leaves (original dtypes).
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if not leaves:
        return tree
    flat = np.asarray(_pack(leaves))
    out = []
    ofs = 0
    for leaf in leaves:
        shape = getattr(leaf, "shape", ())
        n = int(np.prod(shape)) if shape else 1
        dt = np.dtype(getattr(leaf, "dtype", np.float32))
        out.append(flat[ofs:ofs + n].reshape(shape).astype(dt))
        ofs += n
    return jax.tree_util.tree_unflatten(treedef, out)
