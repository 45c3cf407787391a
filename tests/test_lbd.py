"""LBD descriptor + binary matching tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from cube_slam_wu_tpu.ops import lbd
from cube_slam_wu_tpu.utils import io as uio


def _pattern_image(seed=0, shape=(160, 200)):
    rng = np.random.default_rng(seed)
    img = rng.uniform(20, 230, size=(shape[0] // 8, shape[1] // 8))
    img = np.kron(img, np.ones((8, 8)))
    return img


def test_descriptor_shape_and_norm():
    img = jnp.asarray(_pattern_image())
    lines = jnp.asarray([[20.0, 40, 120, 60], [30.0, 100, 150, 90], [0, 0, 0, 0]])
    mask = jnp.asarray([True, True, False])
    desc, valid = lbd.lbd_descriptors(img, lines, mask)
    desc = np.asarray(desc)
    assert desc.shape == (3, 72)
    np.testing.assert_allclose(np.linalg.norm(desc[0]), 1.0, atol=1e-6)
    assert desc.max() <= 0.4 + 1e-6


def test_descriptor_invariance_to_shift():
    """Same local structure at two image locations -> similar descriptors."""
    img_np = _pattern_image(1)
    img2 = np.roll(img_np, (8, 8), axis=(0, 1))
    l1 = jnp.asarray([[40.0, 40, 120, 40]])
    l2 = jnp.asarray([[48.0, 48, 128, 48]])
    m = jnp.asarray([True])
    d1, _ = lbd.lbd_descriptors(jnp.asarray(img_np), l1, m)
    d2, _ = lbd.lbd_descriptors(jnp.asarray(img2), l2, m)
    cos = float(np.sum(np.asarray(d1[0]) * np.asarray(d2[0])))
    assert cos > 0.99, cos


def test_binarize_and_match_self():
    img = jnp.asarray(_pattern_image(2))
    lines = jnp.asarray(
        [[20.0, 40, 120, 60], [30.0, 100, 150, 90], [60.0, 20, 60, 120], [10.0, 10, 100, 10]]
    )
    mask = jnp.ones(4, bool)
    desc, _ = lbd.lbd_descriptors(img, lines, mask)
    words = lbd.binarize_lbd(desc)
    assert words.shape == (4, 8) and words.dtype == jnp.uint32
    idx, dist, matched = lbd.hamming_match(words, words, mask, mask)
    np.testing.assert_array_equal(np.asarray(idx), np.arange(4))
    np.testing.assert_array_equal(np.asarray(dist), 0)
    assert np.asarray(matched).all()


def test_match_across_frames(reference_root):
    """BASELINE config 2: detect + describe + match on a real TUM frame pair;
    matches must be geometrically consistent (small motion between frames)."""
    from cube_slam_wu_tpu.ops.detect import DetectConfig, detect_line_segments

    base = reference_root / "object_slam/data/raw_imgs"
    g1 = jnp.asarray(uio.load_image_gray(base / "0000_rgb_raw.jpg"))
    g2 = jnp.asarray(uio.load_image_gray(base / "0001_rgb_raw.jpg"))
    cfg = DetectConfig()
    l1, m1 = detect_line_segments(g1, cfg)
    l2, m2 = detect_line_segments(g2, cfg)
    d1, _ = lbd.lbd_descriptors(g1, l1, m1)
    d2, _ = lbd.lbd_descriptors(g2, l2, m2)
    w1, w2 = lbd.binarize_lbd(d1), lbd.binarize_lbd(d2)
    # raw reference-semantics NN matching produces matches (the exact count
    # tracks the detector's line set; 11 with the gather-based detector's
    # default config — the quality tracking path is l2_match, not this)
    _, _, nn_matched = lbd.hamming_match(w1, w2, m1, m2)
    assert int(np.asarray(nn_matched).sum()) >= 10
    # quality path: mutual-consistency filtered
    idx, dist, matched = lbd.match_lines_filtered(w1, w2, m1, m2)
    idx, matched = np.asarray(idx), np.asarray(matched)
    l1n, l2n = np.asarray(l1), np.asarray(l2)
    n_matched = int(matched.sum())
    assert n_matched >= 8, n_matched
    # consistency: matched line midpoints move < 40 px between consecutive
    # frames for the majority of filtered matches
    mids1 = (l1n[:, :2] + l1n[:, 2:]) / 2
    mids2 = (l2n[:, :2] + l2n[:, 2:]) / 2
    moved = np.linalg.norm(mids1[matched] - mids2[idx[matched]], axis=1)
    frac_consistent = float((moved < 40).mean())
    assert frac_consistent >= 0.5, (frac_consistent, np.median(moved))


def test_l2_match_self_identity():
    rng = np.random.default_rng(3)
    desc = rng.normal(size=(12, 72))
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    desc = jnp.asarray(desc)
    mask = jnp.ones(12, bool)
    idx, dist, ok = lbd.l2_match(desc, desc, mask, mask)
    assert np.array_equal(np.asarray(idx), np.arange(12))
    assert np.asarray(ok).all()
    assert np.asarray(dist).max() < 1e-6


def test_l2_match_midpoint_gate():
    rng = np.random.default_rng(4)
    desc = rng.normal(size=(4, 72))
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    desc = jnp.asarray(desc)
    mask = jnp.ones(4, bool)
    # train lines far away except index 2
    qlines = jnp.asarray(np.tile([0.0, 0.0, 10.0, 0.0], (4, 1)))
    tlines = jnp.asarray(
        np.stack(
            [
                [500.0, 500.0, 510.0, 500.0],
                [500.0, 500.0, 510.0, 500.0],
                [1.0, 1.0, 11.0, 1.0],
                [500.0, 500.0, 510.0, 500.0],
            ]
        )
    )
    idx, dist, ok = lbd.l2_match(
        desc, desc, mask, mask,
        query_lines=qlines, train_lines=tlines, max_midpoint_dist=50.0,
    )
    # every query is forced onto the only nearby train line (2); queries whose
    # best allowed distance exceeds the threshold are rejected
    assert np.array_equal(np.asarray(idx), np.full(4, 2))
    assert bool(ok[2])  # exact self-match survives
    assert not np.asarray(ok)[[0, 1, 3]].any()  # mutual check kills the rest
