"""LBD descriptor parity vs the reference compiled from source.

tools/ref_oracle/lbd_oracle builds the reference's own BinaryDescriptor
(line_lbd/libs/binary_descriptor.cpp, unmodified, read-only) and dumps,
for fixed keyline sets on the bundled fixtures (line_lbd/data/cabinet.png
and the TUM pair object_slam/data/raw_imgs/0000+0001):

  - computeSobel's blurred image + dx/dy maps (:352-398),
  - computeLBD's 72-float descriptors (:1150-1513),
  - binaryConversion's 32-byte binary codes (:405-416),
  - BinaryDescriptorMatcher::match results (MIH,
    binary_descriptor_matcher.cpp).

Both sides are fed the SAME keylines (endpoints, angle, numOfPixels) so
detector differences cannot contaminate the comparison.  The committed
fixture is tests/data/ref_oracle/lbd.npz (gen_lbd_fixtures.py).

What these tests establish:
  - the band math in ops/lbd.py `_descriptor_from_samples` is the
    reference's, to f32 round-off (max |diff| < 2e-6 via the
    reference-exact sampling path), with bit-identical binarization;
  - the production `lbd_descriptors` sampling (vectorized positions
    instead of computeLBD's sequential f32 accumulation) stays within
    3e-3 of the reference descriptor and still binarizes identically on
    every fixture line;
  - our Sobel stage is bit-exact on the reference's blurred image, and
    our dense Hamming matcher reproduces the reference MIH matcher's
    distances exactly (and its assignments wherever the minimum is
    unique).
"""

import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from cube_slam_wu_tpu.ops import lbd

FIX = pathlib.Path(__file__).parent / "data" / "ref_oracle" / "lbd.npz"


@pytest.fixture(scope="module")
def oracle():
    return np.load(FIX)


def _ref_bits(desc256):
    """(L, 32) bytes -> (L, 32, 8) bool bits [pair, j]."""
    return ((desc256[:, :, None] >> np.arange(8)[None, None, :]) & 1).astype(bool)


def _binarize_np(desc72):
    d9 = np.asarray(desc72).reshape(-1, 9, 8)
    a = np.asarray([c[0] for c in lbd._COMBINATIONS])
    b = np.asarray([c[1] for c in lbd._COMBINATIONS])
    return d9[:, a, :] > d9[:, b, :]  # (L, 32, 8)


@pytest.mark.parametrize("name,shape", [("cabinet", (480, 640)), ("tum0", (480, 640))])
def test_exact_path_descriptor_parity(oracle, name, shape):
    kl = oracle[f"{name}_keylines"]
    desc = lbd.lbd_descriptors_ref_exact(
        shape,
        (oracle[f"{name}_dx"].astype(np.int32), oracle[f"{name}_dy"].astype(np.int32)),
        kl[:, :4],
        kl[:, 4],
        kl[:, 5],
    )
    d = np.abs(np.asarray(desc) - oracle[f"{name}_desc72"])
    assert d.max() < 2e-6, d.max()
    assert (_binarize_np(desc) == _ref_bits(oracle[f"{name}_desc256"])).all()


def test_production_path_parity(oracle):
    """The vectorized production sampling differs from the reference's
    sequential f32 position accumulation only near .5 rounding boundaries;
    descriptors stay within 3e-3 and the 256-bit codes match bit-for-bit
    on all fixture lines."""
    kl = oracle["cabinet_keylines"]
    desc, _ = lbd.lbd_descriptors(
        jnp.zeros((480, 640), jnp.float32),
        jnp.asarray(kl[:, :4], jnp.float32),
        jnp.ones(len(kl), bool),
        max_len=704,
        num_pixels=jnp.asarray(kl[:, 5], jnp.float32),
        gradients=(
            jnp.asarray(oracle["cabinet_dx"], jnp.float32),
            jnp.asarray(oracle["cabinet_dy"], jnp.float32),
        ),
    )
    d = np.abs(np.asarray(desc) - oracle["cabinet_desc72"])
    assert d.max() < 3e-3, d.max()
    flips = (_binarize_np(desc) != _ref_bits(oracle["cabinet_desc256"])).sum()
    assert flips == 0, f"{flips} bit flips"


def test_sobel_bit_exact_on_reference_blur(oracle):
    """Our reflect-101 integer Sobel reproduces cv::Sobel(CV_16S) exactly
    given the reference's own blurred image."""
    blur = oracle["cabinet_blur"]
    H, W = blur.shape
    b = np.pad(blur.astype(np.int64), 1, mode="reflect")
    sm_v = b[0:H, :] + 2 * b[1 : H + 1, :] + b[2 : H + 2, :]
    gx = sm_v[:, 2 : W + 2] - sm_v[:, 0:W]
    sm_h = b[:, 0:W] + 2 * b[:, 1 : W + 1] + b[:, 2 : W + 2]
    gy = sm_h[2 : H + 2, :] - sm_h[0:H, :]
    assert (gx == oracle["cabinet_dx"]).all()
    assert (gy == oracle["cabinet_dy"]).all()


def test_reference_gradients_blur_agreement(oracle):
    """reference_gradients' float blur matches OpenCV's fixed-point 8U
    Gaussian to +/-1 gray level everywhere (the residual is OpenCV's
    internal fixed-point rounding — position-dependent, documented in the
    reference_gradients docstring)."""
    from PIL import Image

    img = np.asarray(Image.open("/root/reference/line_lbd/data/cabinet.png").convert("L"))
    gx, gy = lbd.reference_gradients(img)
    # gradients from an off-by-one blur differ by at most 4 counts per tap
    dmax = np.abs(gx - oracle["cabinet_dx"]).max()
    assert dmax <= 8, dmax
    # and the blur itself is within 1 gray level
    x = np.arange(5.0) - 2.0
    k = np.exp(-(x * x) / 2.0)
    k /= k.sum()
    a = np.pad(img.astype(np.float64), 2, mode="reflect")
    H, W = img.shape
    h = sum(k[i] * a[:, i : i + W] for i in range(5))
    v = sum(k[i] * h[i : i + H, :] for i in range(5))
    blur = np.clip(np.rint(v), 0, 255)
    diff = np.abs(blur - oracle["cabinet_blur"].astype(np.float64))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.5


def test_matcher_parity(oracle):
    """Dense XOR+popcount matching reproduces the reference MIH matcher:
    identical Hamming distances for every reported match, identical
    assignment wherever the minimum is unique, and the same dist<25
    acceptance set (match_line_descrip, line_lbd_allclass.cpp:352-369)."""
    qa = lbd.pack_lbd_bytes(oracle["tum0_desc256"])
    tb = lbd.pack_lbd_bytes(oracle["tum1_desc256"])
    mq = jnp.ones(qa.shape[0], bool)
    mt = jnp.ones(tb.shape[0], bool)
    idx, dist, matched = lbd.hamming_match(qa, tb, mq, mt, max_dist=25)
    ref = oracle["tum_matches"]  # (Lq, 3): q t dist

    # full distance matrix for tie detection
    qb = _ref_bits(oracle["tum0_desc256"]).reshape(len(ref), -1)
    tbits = _ref_bits(oracle["tum1_desc256"]).reshape(tb.shape[0], -1)
    dmat = (qb[:, None, :] != tbits[None, :, :]).sum(-1)

    for q, t, dref in ref.astype(int):
        assert int(dist[q]) == dref, (q, int(dist[q]), dref)
        row = dmat[q]
        if (row == row.min()).sum() == 1:
            assert int(idx[q]) == t
    # acceptance agreement
    ref_accept = {int(q) for q, t, d in ref if d < 25}
    mine_accept = {i for i in range(len(ref)) if bool(matched[i])}
    assert mine_accept == ref_accept


def test_packed_bytes_roundtrip(oracle):
    """pack_lbd_bytes o binarize semantics: our own binarized descriptors
    of the oracle's float descriptors give the oracle's bytes."""
    words_mine = lbd.binarize_lbd(jnp.asarray(oracle["cabinet_desc72"]))
    words_ref = lbd.pack_lbd_bytes(oracle["cabinet_desc256"])
    assert (np.asarray(words_mine) == np.asarray(words_ref)).all()
