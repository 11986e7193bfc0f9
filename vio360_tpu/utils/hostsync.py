"""Batched device->host reads for dispatch-latency environments.

``jax.device_get`` of a pytree fetches each leaf with its own
round trip; through a tunneled-TPU relay each round trip costs
~5-60 ms (measured round 4), so a 10-leaf diagnostic dict costs ~10x
a single packed array. ``fetch_tree`` concatenates every leaf into ONE
f32 vector inside a tiny jitted program (dispatch is async and ~free),
fetches that single array, and re-splits on the host.

This is the host-side twin of estimator/fused.py's design rule: one
dispatch, one transfer per decision point. Integer/bool leaves are
EXACT for the full int32 range: they ride the f32 carrier via
``bitcast_convert_type`` (the 32 bits pass through untouched) and are
bitcast back on the host — no 2^24 rounding cliff. 64-bit leaves are
rejected at trace time rather than silently truncated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .precision import jit as _pjit

# Dtypes whose values would be silently corrupted by a 32-bit carrier.
_REJECT = (jnp.float64, jnp.int64, jnp.uint64, jnp.complex64, jnp.complex128)


def _to_carrier(x):
    """Map one leaf into the f32 carrier, exactly."""
    x = jnp.asarray(x)
    if any(x.dtype == d for d in _REJECT):
        raise TypeError(
            f"fetch_tree: leaf dtype {x.dtype} does not fit the 32-bit "
            "carrier exactly; fetch it separately or narrow it first"
        )
    if jnp.issubdtype(x.dtype, jnp.floating):
        # f32 passes through; f16/bf16 widen exactly.
        return jnp.ravel(x).astype(jnp.float32)
    # bool / int / uint (<= 32 bits): ride the carrier bit-for-bit.
    return jax.lax.bitcast_convert_type(
        jnp.ravel(x).astype(jnp.int32), jnp.float32
    )


@_pjit
def _pack(leaves: list):
    return jnp.concatenate([_to_carrier(x) for x in leaves])


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
        chunk = flat[ofs:ofs + n]
        if dt.kind in "biu":
            # reverse the device-side bitcast, then narrow to the
            # original integer/bool dtype (values are exact).
            vals = np.ascontiguousarray(chunk).view(np.int32)
            out.append(vals.reshape(shape).astype(dt))
        else:
            out.append(chunk.reshape(shape).astype(dt))
        ofs += n
    return jax.tree_util.tree_unflatten(treedef, out)
