"""Checkpoint / resume for parameter pytrees.

The reference has no training loop and therefore no checkpointing
(SURVEY.md §5: "Checkpoint / resume: none"); this framework ships one
because it ships a training step.  Format: one `.npz` holding the
flattened leaves plus a JSON treedef of key paths — dependency-free,
byte-stable, and restorable on any backend.  Writes are atomic
(tmp + rename) so a crash mid-save never corrupts the latest
checkpoint, and `save` keeps a bounded history for resume-after-
rollback.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional

import jax
import numpy as np


def _flatten(tree: Any) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save(path: str, tree: Any, *, step: Optional[int] = None,
         keep: int = 3) -> str:
    """Save ``tree`` to ``path`` (a directory).  Returns the file
    written.  With ``step``, files are `ckpt_{step:08d}.npz` and only
    the newest ``keep`` are retained."""
    os.makedirs(path, exist_ok=True)
    name = f"ckpt_{step:08d}.npz" if step is not None else "ckpt.npz"
    target = os.path.join(path, name)
    flat = _flatten(tree)
    # Dtype fidelity: savez would upcast bf16 via pickle trouble; store
    # raw bytes + dtype string sidecar for non-native dtypes.
    arrays, meta = {}, {}
    for k, v in flat.items():
        if v.dtype.name in ("bfloat16", "float8_e4m3fn", "float8_e5m2"):
            arrays[k] = v.view(np.uint8 if v.dtype.itemsize == 1
                               else np.uint16)
            meta[k] = v.dtype.name
        else:
            arrays[k] = v
    tmp = target + ".tmp.npz"
    with open(tmp, "wb") as f:
        np.savez(f, __meta__=json.dumps(meta), **arrays)
    os.replace(tmp, target)
    if step is not None:
        ckpts = sorted(
            f for f in os.listdir(path)
            if re.fullmatch(r"ckpt_\d{8}\.npz", f))
        for old in ckpts[:-keep]:
            os.remove(os.path.join(path, old))
    return target


def latest(path: str) -> Optional[str]:
    """Newest checkpoint file under ``path``, or None."""
    if not os.path.isdir(path):
        return None
    ckpts = sorted(
        f for f in os.listdir(path)
        if re.fullmatch(r"ckpt(_\d{8})?\.npz", f))
    return os.path.join(path, ckpts[-1]) if ckpts else None


def restore(file: str, like: Any) -> Any:
    """Restore a pytree with the structure of ``like`` from ``file``."""
    import jax.numpy as jnp

    with np.load(file, allow_pickle=False) as data:
        meta = json.loads(str(data["__meta__"]))
        flat = {}
        for k in data.files:
            if k == "__meta__":
                continue
            v = data[k]
            if k in meta:
                v = v.view(jnp.dtype(meta[k]))
            flat[k] = v

    leaves_like, treedef = jax.tree_util.tree_flatten_with_path(like)
    out = []
    for path, leaf in leaves_like:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        v = flat[key]
        if tuple(v.shape) != tuple(np.shape(leaf)):
            raise ValueError(
                f"leaf {key!r}: checkpoint shape {v.shape} != "
                f"model shape {np.shape(leaf)}")
        out.append(jnp.asarray(v))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like), out)
