"""Detection-object association (ops/association)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cube_slam_wu_tpu.ops.association import (
    associate_detections,
    greedy_assign,
    iou_matrix,
)


def test_iou_matrix_known_values():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.asarray(
        [[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0], [20.0, 20.0, 30.0, 30.0]]
    )
    iou = np.asarray(iou_matrix(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 25.0 / 175.0, 0.0], atol=1e-7)


def test_iou_masks_zero_out():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]] * 2)
    b = jnp.asarray([[0.0, 0.0, 10.0, 10.0]] * 3)
    iou = np.asarray(
        iou_matrix(a, b, jnp.asarray([True, False]), jnp.asarray([True, True, False]))
    )
    assert iou[1].max() == 0.0 and iou[:, 2].max() == 0.0
    assert iou[0, 0] == 1.0


def test_greedy_assign_recovers_permutation():
    rng = np.random.default_rng(0)
    perm = rng.permutation(6)
    score = np.full((6, 6), 0.05)
    score[np.arange(6), perm] = 0.9
    col, ok = greedy_assign(jnp.asarray(score), min_score=0.3)
    assert np.asarray(ok).all()
    assert np.array_equal(np.asarray(col), perm)


def test_greedy_assign_one_to_one_and_threshold():
    # both rows prefer column 0; the better one wins, the other falls below
    # threshold on its leftover option
    score = jnp.asarray([[0.9, 0.1], [0.8, 0.2]])
    col, ok = greedy_assign(score, min_score=0.5)
    assert np.asarray(col).tolist() == [0, 2]
    assert np.asarray(ok).tolist() == [True, False]
    # uniqueness even with ties
    col2, ok2 = greedy_assign(jnp.ones((3, 3)), min_score=0.5)
    assert sorted(np.asarray(col2).tolist()) == [0, 1, 2]
    assert np.asarray(ok2).all()


def test_associate_detections_end_to_end():
    tracks = jnp.asarray(
        [[0.0, 0.0, 10.0, 10.0], [50.0, 50.0, 70.0, 70.0], [0.0, 0.0, 1.0, 1.0]]
    )
    tmask = jnp.asarray([True, True, False])  # padded track slot
    dets = jnp.asarray(
        [
            [52.0, 51.0, 71.0, 69.0],  # matches track 1
            [1.0, -1.0, 11.0, 9.0],  # matches track 0
            [200.0, 200.0, 220.0, 230.0],  # new object
            [0.0, 0.0, 0.0, 0.0],  # padding
        ]
    )
    dmask = jnp.asarray([True, True, True, False])
    det_of_track, matched, det_is_new = jax.jit(associate_detections)(
        tracks, tmask, dets, dmask
    )
    assert np.asarray(det_of_track)[:2].tolist() == [1, 0]
    assert np.asarray(matched).tolist() == [True, True, False]
    assert np.asarray(det_is_new).tolist() == [False, False, True, False]


def test_associate_under_vmap_batch():
    tracks = jnp.broadcast_to(
        jnp.asarray([[0.0, 0.0, 10.0, 10.0]]), (4, 1, 4)
    ) + jnp.arange(4.0).reshape(4, 1, 1)
    dets = tracks + 0.5
    tmask = jnp.ones((4, 1), bool)
    dmask = jnp.ones((4, 1), bool)
    _, matched, _ = jax.vmap(associate_detections)(tracks, tmask, dets, dmask)
    assert np.asarray(matched).all()


def test_read_detections_txt_real_files(reference_root):
    from cube_slam_wu_tpu.utils.io import read_detections_txt

    base = reference_root / "object_slam/data/filter_2d_obj_txts"
    boxes, conf, mask = read_detections_txt(base / "0000_yolo2_0.15.txt")
    assert boxes.shape == (1, 4) and mask.all()
    np.testing.assert_allclose(boxes[0], [175, 24, 175 + 385, 24 + 373])
    assert conf[0] == pytest.approx(0.42)
    # detector dropout: empty file
    b2, c2, m2 = read_detections_txt(base / "0020_yolo2_0.15.txt", n_max=4)
    assert b2.shape == (4, 4) and not m2.any()
    # padding to fixed shape
    b3, c3, m3 = read_detections_txt(base / "0000_yolo2_0.15.txt", n_max=3)
    assert b3.shape == (3, 4) and m3.tolist() == [True, False, False]
