"""Pack LBD oracle dumps into the committed parity fixture
tests/data/ref_oracle/lbd.npz.

Run after `make build/lbd_oracle`:
    python gen_lbd_fixtures.py

Regenerates every dump from the read-only reference data and the oracle
binary, so the fixture is reproducible end-to-end on this machine."""
import pathlib
import subprocess
import tempfile

import numpy as np

HERE = pathlib.Path(__file__).parent
ORACLE = HERE / "build" / "lbd_oracle"
OUT = HERE.parent.parent / "tests" / "data" / "ref_oracle" / "lbd.npz"

CABINET = "/root/reference/line_lbd/data/cabinet.png"
TUM0 = "/root/reference/object_slam/data/raw_imgs/0000_rgb_raw.jpg"
TUM1 = "/root/reference/object_slam/data/raw_imgs/0001_rgb_raw.jpg"


def run(*args):
    subprocess.run([str(ORACLE), *map(str, args)], check=True)


def main():
    with tempfile.TemporaryDirectory() as td:
        d = pathlib.Path(td)
        data = {}
        for name, img in (("cabinet", CABINET), ("tum0", TUM0), ("tum1", TUM1)):
            run("detect", img, 15, d / f"{name}_det")
            kl = np.loadtxt(d / f"{name}_det_keylines.txt")
            np.savetxt(d / f"{name}_lines.txt", kl[:, :4])
            run("describe", img, d / f"{name}_lines.txt", d / f"{name}")
            data[f"{name}_keylines"] = np.loadtxt(d / f"{name}_keylines.txt").astype(np.float64)
            data[f"{name}_desc72"] = np.loadtxt(d / f"{name}_desc72.txt").astype(np.float32)
            data[f"{name}_desc256"] = np.loadtxt(d / f"{name}_desc256.txt").astype(np.uint8)
        for name, img in (("cabinet", CABINET), ("tum0", TUM0)):
            run("gradients", img, d / f"{name}")
            data[f"{name}_blur"] = np.loadtxt(d / f"{name}_blur.txt").astype(np.uint8)
            data[f"{name}_dx"] = np.loadtxt(d / f"{name}_dx.txt").astype(np.int16)
            data[f"{name}_dy"] = np.loadtxt(d / f"{name}_dy.txt").astype(np.int16)
        run("match", d / "tum0_desc256.txt", d / "tum1_desc256.txt", d / "matches.txt")
        data["tum_matches"] = np.loadtxt(d / "matches.txt").astype(np.float64).reshape(-1, 3)
        np.savez_compressed(OUT, **data)
    sizes = {k: v.shape for k, v in data.items()}
    print(f"wrote {OUT} ({OUT.stat().st_size/1e6:.2f} MB): {sizes}")


if __name__ == "__main__":
    main()
