"""Batched device->host reads for dispatch-latency environments.

``jax.device_get`` of a pytree fetches each leaf with its own
round trip; through a tunneled-TPU relay each round trip costs
~5-60 ms (measured round 4), so a 10-leaf diagnostic dict costs ~10x
a single packed array. ``fetch_tree`` concatenates every leaf into ONE
f32 vector inside a tiny jitted program (dispatch is async and ~free),
fetches that single array, and re-splits on the host.

This is the host-side twin of estimator/fused.py's design rule: one
dispatch, one transfer per decision point. Integer/bool leaves are
EXACT for the full int32 range: each int rides the carrier as TWO f32
lanes (hi = x >> 12, lo = x & 0xfff — both well inside the 24-bit
mantissa) and is reassembled on the host — no 2^24 rounding cliff.
A bitcast carrier would be cheaper but is NOT safe here: bitcasting
small ints to f32 yields denormal bit patterns, and the TPU path
flushes denormals to zero (measured: booleans arrived as False through
the relay). Under x64 mode (--x64), float64 leaves ride as a
double-float (hi, lo) pair — ~49 mantissa bits reconstructed — and
int64 leaves narrow through int32 (every integer leaf here is a
count/id).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .precision import jit as _pjit

# Dtypes the carrier cannot represent at all.
_REJECT = (jnp.complex64, jnp.complex128)


def _is_intlike(dt) -> bool:
    return np.dtype(dt).kind in "biu"


def _is_f64(dt) -> bool:
    return np.dtype(dt) == np.float64


def _to_carrier(x):
    """Map one leaf into the f32 carrier, exactly (ints) or to double-
    float precision (f64 under x64 mode)."""
    x = jnp.asarray(x)
    if any(x.dtype == d for d in _REJECT):
        raise TypeError(
            f"fetch_tree: leaf dtype {x.dtype} does not fit the 32-bit "
            "carrier exactly; fetch it separately or narrow it first"
        )
    if x.dtype == jnp.float64:
        # x64 mode: double-float split (hi + lo reconstructs ~49
        # mantissa bits — far beyond any downstream consumer here).
        hi = jnp.ravel(x).astype(jnp.float32)
        lo = (jnp.ravel(x) - hi.astype(jnp.float64)).astype(jnp.float32)
        return jnp.concatenate([hi, lo])
    if jnp.issubdtype(x.dtype, jnp.floating):
        # f32 passes through; f16/bf16 widen exactly.
        return jnp.ravel(x).astype(jnp.float32)
    # bool / int / uint: two f32 lanes per value, both exact in the
    # 24-bit mantissa and FTZ-safe (normal floats). 64-bit ints narrow
    # through int32 first (every integer leaf in this codebase is a
    # count/id < 2^31).
    v = jnp.ravel(x).astype(jnp.int32)
    hi = (v >> 12).astype(jnp.float32)  # arithmetic shift: floor(v/4096)
    lo = (v & 0xFFF).astype(jnp.float32)  # [0, 4096)
    return jnp.concatenate([hi, lo])


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
        if _is_intlike(dt):
            hi = flat[ofs:ofs + n].astype(np.int64)
            lo = flat[ofs + n:ofs + 2 * n].astype(np.int64)
            vals = (hi * 4096 + lo).astype(np.int32)
            out.append(vals.reshape(shape).astype(dt))
            ofs += 2 * n
        elif _is_f64(dt):
            hi = flat[ofs:ofs + n].astype(np.float64)
            lo = flat[ofs + n:ofs + 2 * n].astype(np.float64)
            out.append((hi + lo).reshape(shape))
            ofs += 2 * n
        else:
            out.append(flat[ofs:ofs + n].reshape(shape).astype(dt))
            ofs += n
    return jax.tree_util.tree_unflatten(treedef, out)
