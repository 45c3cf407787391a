"""Dataset IO: images, whitespace-separated txt tables, TUM pose files.

Covers the reference's file contracts (read_all_number_txt,
matrix_utils.cpp:209-245; the TUM-format trajectory txts and the
`x y w h prob` YOLO txts under object_slam/data/).  All readers return numpy;
conversion to device arrays happens at the pipeline boundary.
"""

from __future__ import annotations

import pathlib

import numpy as np


def read_number_txt(path, min_cols: int | None = None) -> np.ndarray:
    """Whitespace table -> (rows, cols) float array; skips '#' comments and
    blank lines (read_all_number_txt semantics)."""
    rows = []
    for line in pathlib.Path(path).read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        rows.append([float(tok) for tok in line.split()])
    if not rows:
        return np.zeros((0, min_cols or 0))
    width = max(len(r) for r in rows)
    out = np.zeros((len(rows), width))
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
    return out


def load_image_gray(path) -> np.ndarray:
    """Load an image as the rounded BT.601 grayscale float array the proposal
    engine expects (see ops.image.rgb_to_gray)."""
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), dtype=np.float64)
    gray = img @ np.asarray([0.299, 0.587, 0.114])
    return np.floor(gray + 0.5)


def load_image_rgb(path) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), dtype=np.uint8)


def write_tum_trajectory(path, timestamps, poses_xyzq) -> None:
    """Write TUM rows `t x y z qx qy qz qw` (same schema as the reference's
    output_cam_poses.txt, main_obj.cpp:305-336)."""
    arr = np.concatenate(
        [np.asarray(timestamps)[:, None], np.asarray(poses_xyzq)], axis=1
    )
    header = "timestamp tx ty tz qx qy qz qw"
    np.savetxt(path, arr, fmt="%.6f", header=header)
