"""Estimator state snapshots: save / resume mid-sequence.

New capability vs the reference, which has no serialization at all
(SURVEY.md §5 "Checkpoint / resume": results live only in memory/GUI).
A checkpoint captures the COMPLETE estimator state — tracker SoA
arrays, sliding-window keyframes/landmarks, inertial state,
preintegration buffers, PRNG key, bootstrap snapshots, previous image
and recorded trajectory — so a resumed run is bit-identical to an
uninterrupted one (asserted by tests/test_checkpoint.py).

Format: a single ``.npz`` holding every array leaf under a stable
path-derived name, plus a JSON manifest of the pytree structure and
scalar fields. No pickle — checkpoints are safe to load from
untrusted storage.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def _flatten(prefix: str, obj, out: dict):
    """Flatten nested dict/list/tuple/registered-dataclass pytrees into
    {path: numpy leaf}; returns a JSON-able structure descriptor."""
    if obj is None:
        return {"t": "none"}
    if isinstance(obj, np.generic):  # np scalar -> JSON-able python scalar
        obj = obj.item()
    if isinstance(obj, (dict,)):
        keys = sorted(obj.keys())
        return {
            "t": "dict",
            "k": keys,
            "v": [_flatten(f"{prefix}.{k}", obj[k], out) for k in keys],
        }
    if isinstance(obj, (list, tuple)):
        return {
            "t": "list" if isinstance(obj, list) else "tuple",
            "v": [_flatten(f"{prefix}.{i}", x, out) for i, x in enumerate(obj)],
        }
    if dataclasses_is_instance(obj):
        import dataclasses

        fields = [f.name for f in dataclasses.fields(obj)]
        return {
            "t": "dc",
            "cls": type(obj).__module__ + ":" + type(obj).__qualname__,
            "k": fields,
            "v": [_flatten(f"{prefix}.{f}", getattr(obj, f), out) for f in fields],
        }
    if isinstance(obj, (bool, int, float, str)):
        return {"t": "py", "v": obj}
    # array leaf (jax or numpy)
    arr = np.asarray(obj)
    out[prefix] = arr
    return {"t": "arr", "name": prefix}


def dataclasses_is_instance(obj) -> bool:
    import dataclasses

    return dataclasses.is_dataclass(obj) and not isinstance(obj, type)


_DC_REGISTRY: dict[str, type] = {}


def _resolve_dc(tag: str) -> type:
    if tag not in _DC_REGISTRY:
        mod, qual = tag.split(":")
        import importlib

        cls = importlib.import_module(mod)
        for part in qual.split("."):
            cls = getattr(cls, part)
        _DC_REGISTRY[tag] = cls
    return _DC_REGISTRY[tag]


def _unflatten(desc, arrays: dict):
    t = desc["t"]
    if t == "none":
        return None
    if t == "dict":
        return {k: _unflatten(v, arrays) for k, v in zip(desc["k"], desc["v"])}
    if t in ("list", "tuple"):
        vals = [_unflatten(v, arrays) for v in desc["v"]]
        return vals if t == "list" else tuple(vals)
    if t == "dc":
        cls = _resolve_dc(desc["cls"])
        kwargs = {k: _unflatten(v, arrays) for k, v in zip(desc["k"], desc["v"])}
        return cls(**kwargs)
    if t == "py":
        return desc["v"]
    return arrays[desc["name"]]


def save_state(path: str, state: dict) -> None:
    """Write a state dict (nested pytrees, array leaves) to ``path``."""
    arrays: dict[str, np.ndarray] = {}
    manifest = _flatten("s", state, arrays)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, __manifest__=np.frombuffer(
            json.dumps(manifest).encode(), dtype=np.uint8
        ), **arrays)
    os.replace(tmp, path)


def load_state(path: str) -> dict:
    with np.load(path, allow_pickle=False) as z:
        manifest = json.loads(bytes(z["__manifest__"]).decode())
        arrays = {k: z[k] for k in z.files if k != "__manifest__"}
    return _unflatten(manifest, arrays)


def device_put_tree(tree):
    """numpy leaves -> device arrays (post-load)."""
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tree
    )
