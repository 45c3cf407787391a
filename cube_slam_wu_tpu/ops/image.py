"""Batched image ops: grayscale, Sobel, Canny edges, exact distance transform.

TPU-native replacements for the OpenCV calls in the reference proposal engine
(`cv::Canny(gray(roi), 80, 200)` and `cv::distanceTransform(255-canny,
CV_DIST_L2, 3)`, detect_3d_cuboid/src/box_proposal_detail.cpp:322-327).
Differences by design:

- everything is fixed-shape and jit-friendly; the ROI is handled by clamping
  coordinates (replicate-border semantics identical to running OpenCV on the
  cropped ROI) plus validity masks, not by dynamic crops;
- the distance transform is an *exact* Euclidean EDT (column scan + row-wise
  lower-envelope minimisation as one batched reduction) rather than OpenCV's
  3x3 chamfer approximation — exactness keeps proposal rankings stable
  (SURVEY.md section 7.3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) RGB [0,255] -> rounded gray float (..., H, W).

    Uses the BT.601 weights OpenCV uses for CV_BGR2GRAY (the reference
    converts with cv::cvtColor, box_proposal_detail.cpp:82-86), with
    round-half-away like OpenCV's fixed-point path.
    """
    w = jnp.asarray([0.299, 0.587, 0.114], dtype=img.dtype)
    gray = jnp.tensordot(img, w, axes=[[-1], [0]])
    return jnp.floor(gray + 0.5)


def replicate_roi(gray: jnp.ndarray, x0, y0, x1, y1) -> jnp.ndarray:
    """Fill the full-size buffer with the ROI [x0,x1]x[y0,y1] (inclusive),
    replicating the ROI border outward.

    Filtering this buffer with any local stencil reproduces, inside the ROI,
    exactly what the same filter computes on the cropped ROI with
    BORDER_REPLICATE — which is how the reference runs Canny on
    `gray_img(object_bbox)` (box_proposal_detail.cpp:324).
    """
    h, w = gray.shape[-2:]
    ys = jnp.clip(jnp.arange(h), y0, y1)
    xs = jnp.clip(jnp.arange(w), x0, x1)
    return gray[..., ys, :][..., :, xs]


def sobel3(gray: jnp.ndarray):
    """3x3 Sobel derivatives (replicate border). Returns (gx, gy)."""
    # separable: smooth [1 2 1], diff [-1 0 1]
    def _pad(a, axis):
        idx_lo = [slice(None)] * a.ndim
        idx_hi = [slice(None)] * a.ndim
        idx_lo[axis] = slice(0, 1)
        idx_hi[axis] = slice(-1, None)
        return jnp.concatenate([a[tuple(idx_lo)], a, a[tuple(idx_hi)]], axis=axis)

    def _conv1(a, axis, k):
        ap = _pad(a, axis)
        n = a.shape[axis]

        def sl(off):
            idx = [slice(None)] * a.ndim
            idx[axis] = slice(off, off + n)
            return ap[tuple(idx)]

        return k[0] * sl(0) + k[1] * sl(1) + k[2] * sl(2)

    smooth = jnp.asarray([1.0, 2.0, 1.0], dtype=gray.dtype)
    diff = jnp.asarray([-1.0, 0.0, 1.0], dtype=gray.dtype)
    gx = _conv1(_conv1(gray, -2, smooth), -1, diff)
    gy = _conv1(_conv1(gray, -1, smooth), -2, diff)
    return gx, gy


def _nms(mag: jnp.ndarray, gx: jnp.ndarray, gy: jnp.ndarray) -> jnp.ndarray:
    """Non-maximum suppression along the quantised gradient direction
    (OpenCV Canny sector logic: tan(22.5deg) boundaries)."""
    ax, ay = jnp.abs(gx), jnp.abs(gy)
    tg22 = 0.4142135623730950488  # tan(pi/8)
    # sector 0: |gy| < tan22*|gx|        -> horizontal gradient, compare L/R
    # sector 2: |gy| > tan(3pi/8)*|gx|   -> vertical gradient, compare U/D
    # else diagonal, sign picks which one
    horiz = ay < tg22 * ax
    vert = ay > (ax / tg22)
    diag_main = jnp.logical_and(~horiz, ~vert) & (jnp.sign(gx) == jnp.sign(gy))
    # neighbours via roll (wraps at borders; harmless — the proposal path
    # only reads the map inside its ROI, whose border is replicate-padded)
    def shift(a, dy, dx):
        return jnp.roll(a, (dy, dx), axis=(-2, -1))

    left, right = shift(mag, 0, 1), shift(mag, 0, -1)
    up, down = shift(mag, 1, 0), shift(mag, -1, 0)
    ul, dr = shift(mag, 1, 1), shift(mag, -1, -1)
    ur, dl = shift(mag, 1, -1), shift(mag, -1, 1)

    n1 = jnp.where(horiz, left, jnp.where(vert, up, jnp.where(diag_main, ul, ur)))
    n2 = jnp.where(horiz, right, jnp.where(vert, down, jnp.where(diag_main, dr, dl)))
    # OpenCV keeps a pixel if mag > n1 and mag >= n2 (breaks ties one-sided)
    return jnp.logical_and(mag > n1, mag >= n2)


def canny(
    gray: jnp.ndarray,
    low: float = 80.0,
    high: float = 200.0,
    max_hysteresis_iters: int = 256,
) -> jnp.ndarray:
    """Canny edge mask (bool, same shape as gray), L1 gradient norm.

    Matches OpenCV `cv::Canny(img, low, high)` semantics (aperture 3,
    L2gradient=false): Sobel -> |gx|+|gy| -> direction-quantised NMS ->
    hysteresis by fixpoint dilation of strong edges through weak pixels.
    """
    gx, gy = sobel3(gray)
    mag = jnp.abs(gx) + jnp.abs(gy)
    keep = _nms(mag, gx, gy)
    strong = keep & (mag > high)
    weak = keep & (mag > low)

    # Hysteresis on BIT-PACKED masks: one uint8 byte holds 8 pixels along
    # the row axis, so each constrained dilation touches 8x less memory and
    # the whole fixpoint runs on (H, W/8) words.  The fixpoint (weak pixels
    # 8-connected to a strong seed) is identical to the unpacked version —
    # packing changes the arithmetic, not the lattice.  Measured: the
    # unpacked roll-based loop was ~2 ms of the 8.5 ms proposal grid at VGA
    # (scratch/micro_r4.log); packed it is a rounding error.
    w_px = weak.shape[-1]
    weak_p = jnp.packbits(weak, axis=-1, bitorder="little")
    strong_p = jnp.packbits(strong, axis=-1, bitorder="little")

    def shift_dec(m):  # value of pixel x-1, at position x
        carry = jnp.concatenate(
            [jnp.zeros_like(m[:, :1]), m[:, :-1] >> 7], axis=1
        )
        return (m << 1) | carry

    def shift_inc(m):  # value of pixel x+1, at position x
        carry = jnp.concatenate(
            [m[:, 1:] << 7, jnp.zeros_like(m[:, :1])], axis=1
        )
        return (m >> 1) | carry

    def dilate8(m):
        mx = m | shift_dec(m) | shift_inc(m)
        up = jnp.concatenate([jnp.zeros_like(mx[:1]), mx[:-1]], axis=0)
        dn = jnp.concatenate([mx[1:], jnp.zeros_like(mx[:1])], axis=0)
        return mx | up | dn

    def body(state):
        edges, _, i = state
        # 16 constrained dilations per convergence check: cuts while_loop
        # round trips 16x (each TPU loop iteration costs fixed launch latency)
        grown = edges
        for _ in range(16):
            grown = dilate8(grown) & weak_p
        changed = jnp.any(grown != edges)
        return grown, changed, i + 16

    def cond(state):
        _, changed, i = state
        return jnp.logical_and(changed, i < max_hysteresis_iters)

    # derive the initial flag from data so its sharding type matches the
    # body output under shard_map (varying-manual-axes consistency)
    init_changed = jnp.any(strong_p) | jnp.logical_not(jnp.any(strong_p))
    edges_p, _, _ = jax.lax.while_loop(
        cond, body, (strong_p, init_changed, jnp.asarray(0))
    )
    return jnp.unpackbits(
        edges_p, axis=-1, count=w_px, bitorder="little"
    ).astype(bool)


def _edt_1d_columns(edge: jnp.ndarray) -> jnp.ndarray:
    """Per-column distance (in rows) to the nearest edge pixel in that column.

    Exact min-plus DOUBLING instead of a sequential forward/backward scan:
    after step k, d[i] = min_{|j-i| < 2^k} (init[j] + |i-j|), so ceil(log2 h)
    whole-image steps replace 2·h dependent scan rows (the scan was ~1 ms of
    map time at VGA; this is ~10 fused elementwise passes).  Values are
    exact small integers wherever a column edge is reachable — identical to
    the scan's output after the 1e6 clamp downstream — and +inf-like where
    not.
    """
    h = edge.shape[-2]
    big = jnp.asarray(1e9, dtype=jnp.float32)
    d = jnp.where(edge, 0.0, big)

    off = 1
    while off < h:
        pad = jnp.full_like(d[:off], big)
        up = jnp.concatenate([pad, d[:-off]], axis=0)  # d[i - off]
        dn = jnp.concatenate([d[off:], pad], axis=0)  # d[i + off]
        d = jnp.minimum(d, jnp.minimum(up, dn) + float(off))
        off *= 2
    return d


def distance_transform(
    edge: jnp.ndarray, row_chunk: int = 32, use_pallas: bool | None = None
) -> jnp.ndarray:
    """Exact Euclidean distance transform to the nearest True pixel.

    Two stages: per-column 1D distances g(x, y), then per-row exact
    minimisation D(y, x) = min_x' sqrt((x - x')^2 + g(x', y)^2).  On TPU the
    row stage runs as a VMEM-resident Pallas kernel
    (ops.pallas_kernels.edt_row_min); elsewhere as a chunked dense reduction.

    Pixels in images with no edges at all get a large finite value.
    """
    h, w = edge.shape[-2:]
    g = _edt_1d_columns(edge)  # (h, w) distance along columns
    g2 = jnp.minimum(g, 1e6) ** 2  # (h, w)

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from cube_slam_wu_tpu.ops.pallas_kernels import edt_row_min

        return edt_row_min(g2).astype(g2.dtype)

    xs = jnp.arange(w, dtype=g2.dtype)
    dx2 = (xs[:, None] - xs[None, :]) ** 2  # (w out, w src)

    def row_block(g2_block):
        # g2_block: (chunk, w) -> (chunk, w) of min over src
        return jnp.min(g2_block[:, None, :] + dx2[None, :, :], axis=-1)

    n_chunks = -(-h // row_chunk)
    pad = n_chunks * row_chunk - h
    g2p = jnp.pad(g2, ((0, pad), (0, 0)))
    blocks = g2p.reshape(n_chunks, row_chunk, w)
    out = jax.lax.map(row_block, blocks).reshape(n_chunks * row_chunk, w)[:h]
    return jnp.sqrt(out)


@functools.partial(jax.jit, static_argnames=("low", "high"))
def roi_canny_distance_map(
    gray: jnp.ndarray, x0, y0, x1, y1, low: float = 80.0, high: float = 200.0
) -> jnp.ndarray:
    """Distance map used by proposal scoring: Canny on the (replicate-border)
    ROI [x0,x1]x[y0,y1] inclusive, then exact EDT to those edges, evaluated on
    the full-image grid (lookups are only valid inside the ROI).

    Mirrors box_proposal_detail.cpp:322-327 with absolute-coordinate lookups
    (the reference shifts corners into ROI coordinates; both index the same
    pixels since the ROI origin is integral).
    """
    buf = replicate_roi(gray, x0, y0, x1, y1)
    edges = canny(buf, low=low, high=high)
    ys = jnp.arange(gray.shape[-2])[:, None]
    xs = jnp.arange(gray.shape[-1])[None, :]
    inside = (ys >= y0) & (ys <= y1) & (xs >= x0) & (xs <= x1)
    return distance_transform(edges & inside)
