"""Checkpoint round-trip tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from cube_slam_wu_tpu.slam import checkpoint
from cube_slam_wu_tpu.slam.graph import CameraObjectGraph
from test_ba import _make_synthetic


def test_graph_roundtrip(tmp_path):
    graph, _, _ = _make_synthetic(F=8, n_active=5, seed=4)
    p = tmp_path / "ckpt.npz"
    checkpoint.save_pytree(p, graph)
    template = CameraObjectGraph.empty(8)
    restored = checkpoint.load_pytree(p, template)
    for a, b in zip(
        __import__("jax").tree.leaves(graph), __import__("jax").tree.leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_capacity_mismatch_rejected(tmp_path):
    graph, _, _ = _make_synthetic(F=8, seed=1)
    p = tmp_path / "ckpt.npz"
    checkpoint.save_pytree(p, graph)
    with pytest.raises(ValueError):
        checkpoint.load_pytree(p, CameraObjectGraph.empty(16))


def test_missing_leaf_rejected(tmp_path):
    p = tmp_path / "ckpt.npz"
    checkpoint.save_pytree(p, {"a": jnp.ones(3)})
    with pytest.raises(KeyError):
        checkpoint.load_pytree(p, {"a": jnp.ones(3), "b": jnp.ones(2)})
