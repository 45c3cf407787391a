"""Native runtime library tests (C++ parser/profiler/prefetcher)."""

import numpy as np
import pytest

from cube_slam_wu_tpu import native


def test_native_builds():
    assert native.available(), "C++ toolchain should be available in this image"


def test_parse_table_matches_numpy(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(37, 8))
    p = tmp_path / "t.txt"
    np.savetxt(p, arr)
    out = native.read_table(p)
    np.testing.assert_allclose(out, arr, rtol=1e-12)


def test_parse_table_comments_and_ragged():
    text = "# header line\n1 2 3\n\n4 5\n6 7 8 9\n"
    out = native.parse_table(text)
    assert out.shape == (3, 4)
    np.testing.assert_allclose(out[0], [1, 2, 3, 0])
    np.testing.assert_allclose(out[1], [4, 5, 0, 0])
    np.testing.assert_allclose(out[2], [6, 7, 8, 9])


def test_parse_reference_dataset(reference_root):
    base = reference_root / "object_slam/data"
    truth = native.read_table(base / "truth_cam_poses.txt")
    assert truth.shape == (58, 8)
    ref = np.loadtxt(base / "truth_cam_poses.txt")
    np.testing.assert_allclose(truth, ref)


def test_profiler_aggregates():
    import time

    native.prof_reset()
    for _ in range(3):
        native.prof_tictoc("unit-test-section")
        time.sleep(0.01)
        native.prof_tictoc("unit-test-section")
    rep = native.prof_report()
    assert "unit-test-section" in rep
    line = [l for l in rep.splitlines() if "unit-test-section" in l][0]
    assert " 3 " in line or line.split()[1] == "3"
    native.prof_reset()


def test_prefetcher_roundtrip(tmp_path):
    paths = []
    for i in range(10):
        p = tmp_path / f"f{i}.bin"
        p.write_bytes(bytes([i]) * (1000 + i))
        paths.append(p)
    pf = native.FilePrefetcher(paths, n_threads=3)
    # out-of-order access
    for i in [7, 0, 9, 3]:
        data = pf.get(i)
        assert data == bytes([i]) * (1000 + i)
    pf.close()


def test_prefetcher_missing_file(tmp_path):
    pf = native.FilePrefetcher([tmp_path / "nope.bin"])
    if native.available():
        with pytest.raises(IOError):
            pf.get(0)
    pf.close()
