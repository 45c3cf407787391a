"""Checkpoint / resume for SLAM state.

The reference has no optimizer checkpointing — its nearest mechanism is the
offline replay txts (SURVEY.md section 5.4).  Here any pytree (the factor
graph, point factors, whole pipeline state) round-trips through a single
.npz file keyed by tree path, so long runs (KITTI sequences) can resume and
results can be archived next to the txt artifact dumps.
"""

from __future__ import annotations

import pathlib

import jax
import numpy as np


def _path_key(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "key"):
            parts.append(str(p.key))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _resolve(path) -> pathlib.Path:
    """np.savez appends '.npz' to names lacking the suffix; resolve to the
    filename that actually lands on disk so save/load stay symmetric (a
    '<name>.carry' companion is stored as '<name>.carry.npz' — the round-4
    KITTI-resume bug was load opening the suffix-less name)."""
    p = pathlib.Path(path)
    return p if p.suffix == ".npz" else p.with_name(p.name + ".npz")


def save_pytree(path, tree) -> None:
    """Save any pytree of arrays to one .npz file (keys = tree paths)."""
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    payload = {}
    for p, leaf in leaves:
        payload[_path_key(p)] = np.asarray(leaf)
    path = _resolve(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **payload)


def load_pytree(path, template):
    """Restore a pytree saved by save_pytree into `template`'s structure.

    Shapes/dtypes must match the template's leaves (strict — resuming into a
    different graph capacity is an error, not a silent truncation)."""
    data = np.load(_resolve(path))
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for p, tmpl_leaf in paths:
        key = _path_key(p)
        if key not in data:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = data[key]
        tmpl_arr = np.asarray(tmpl_leaf)
        if arr.shape != tmpl_arr.shape:
            raise ValueError(
                f"checkpoint leaf {key!r} shape {arr.shape} != template {tmpl_arr.shape}"
            )
        leaves.append(jax.numpy.asarray(arr, dtype=tmpl_arr.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
