"""Fused Pallas hypothesis kernel (ops/proposal_fused.py) equivalence vs the
unfused XLA path on the reference demo fixture (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from cube_slam_wu_tpu.ops.proposal import ProposalConfig, detect_cuboid_single
from cube_slam_wu_tpu.utils import io as uio

BASE = "/root/reference/detect_3d_cuboid/data/"


def _demo_inputs(dtype=jnp.float64):
    """The reference demo driver's exact inputs (main.cpp:29-76)."""
    gray = jnp.asarray(uio.load_image_gray(BASE + "0000_rgb_raw.jpg"), dtype)
    K = jnp.asarray([[529.5, 0, 365.0], [0, 529.5, 265.0], [0, 0, 1]], dtype)
    T = jnp.asarray(
        [
            [1, 0.0011, 0.0004, 0],
            [0, -0.3376, 0.9413, 0],
            [0.0011, -0.9413, -0.3376, 1.35],
            [0, 0, 0, 1.0],
        ],
        dtype,
    )
    bbox = jnp.asarray([187.0, 188.0, 201.0, 311.0], dtype)
    edges = np.loadtxt(BASE + "edge_detection/LSD/0000_edge.txt")
    L = 320
    lines = np.zeros((L, 4), np.float64)
    lines[: len(edges)] = edges[:, :4]
    mask = np.zeros(L, bool)
    mask[: len(edges)] = True
    return gray, K, T, bbox, jnp.asarray(lines, dtype), jnp.asarray(mask)


def test_fused_grid_matches_unfused(reference_root):
    """Every per-hypothesis quantity (validity, scores, lift, corners) must
    match between the fused kernel and the reference-semantics XLA path."""
    args = _demo_inputs()
    base_cfg = dict(max_lines=320, sample_cam_roll_pitch=False)
    _, ref = detect_cuboid_single(
        *args, ProposalConfig(**base_cfg), return_internals=True
    )
    _, fus = detect_cuboid_single(
        *args, ProposalConfig(fused_kernel=True, **base_cfg),
        return_internals=True,
    )
    np.testing.assert_array_equal(np.asarray(ref["valid"]), np.asarray(fus["valid"]))
    np.testing.assert_array_equal(np.asarray(ref["vp1_pos"]), np.asarray(fus["vp1_pos"]))
    v = np.asarray(ref["valid"])
    for key, tol in (("angle", 1e-9), ("dist", 1e-9), ("final", 1e-7)):
        a = np.asarray(ref[key])[v]
        b = np.asarray(fus[key])[v]
        np.testing.assert_allclose(a, b, rtol=0, atol=tol, err_msg=key)
    np.testing.assert_allclose(
        np.asarray(ref["corners"])[v], np.asarray(fus["corners"])[v],
        rtol=0, atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(ref["pos"])[v], np.asarray(fus["pos"])[v], rtol=0, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(ref["scale"])[v], np.asarray(fus["scale"])[v], rtol=0, atol=1e-8
    )
    assert int(ref["best"]) == int(fus["best"])


def test_fused_winner_matches_with_rp_sampling(reference_root):
    """Winner-level equivalence on the full roll/pitch-sampled online grid."""
    args = _demo_inputs()
    kw = dict(max_lines=320, sample_cam_roll_pitch=True)
    a = detect_cuboid_single(*args, ProposalConfig(**kw))
    b = detect_cuboid_single(*args, ProposalConfig(fused_kernel=True, **kw))
    a = jax.tree.map(np.asarray, a)
    b = jax.tree.map(np.asarray, b)
    assert bool(a.valid) and bool(b.valid)
    np.testing.assert_array_equal(a.box_config_type, b.box_config_type)
    np.testing.assert_allclose(a.pos, b.pos, rtol=0, atol=1e-8)
    np.testing.assert_allclose(a.scale, b.scale, rtol=0, atol=1e-8)
    np.testing.assert_allclose(a.corners_2d, b.corners_2d, rtol=0, atol=1e-8)
