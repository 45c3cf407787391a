import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from cube_slam_wu_tpu.ops.detect import detect_line_segments, DetectConfig
from cube_slam_wu_tpu.ops import lbd
from cube_slam_wu_tpu.utils import io as uio

base = "/root/reference/object_slam/data/raw_imgs/"
g1 = jnp.asarray(uio.load_image_gray(base + "0000_rgb_raw.jpg"))
g2 = jnp.asarray(uio.load_image_gray(base + "0001_rgb_raw.jpg"))
cfg = DetectConfig()
l1, m1 = detect_line_segments(g1, cfg)
l2, m2 = detect_line_segments(g2, cfg)
d1, _ = lbd.lbd_descriptors(g1, l1, m1)
d2, _ = lbd.lbd_descriptors(g2, l2, m2)
w1, w2 = np.asarray(lbd.binarize_lbd(d1)), np.asarray(lbd.binarize_lbd(d2))
m1, m2 = np.asarray(m1), np.asarray(m2)
l1n, l2n = np.asarray(l1), np.asarray(l2)
d1n, d2n = np.asarray(d1), np.asarray(d2)

def pop(x):
    return bin(int(x)).count("1")
D = np.zeros((len(w1), len(w2)), int)
for i in range(len(w1)):
    for j in range(len(w2)):
        D[i, j] = sum(pop(a ^ b) for a, b in zip(w1[i], w2[j]))
D[~m1] = 999; D[:, ~m2] = 999

mids1 = (l1n[:, :2] + l1n[:, 2:]) / 2
mids2 = (l2n[:, :2] + l2n[:, 2:]) / 2

def stats(match_idx, accept, label):
    acc = np.nonzero(accept)[0]
    if len(acc) == 0: print(label, "none"); return
    moved = np.linalg.norm(mids1[acc] - mids2[match_idx[acc]], axis=1)
    print(f"{label}: n={len(acc)} consistent(<40px)={float((moved<40).mean()):.2f} med_move={np.median(moved):.0f}")

# plain NN dist<25
nn = D.argmin(1); best = D.min(1)
stats(nn, m1 & (best < 25), "NN dist<25       ")
# mutual NN
nn2 = D.argmin(0)
mutual = m1 & (best < 25) & (nn2[nn] == np.arange(len(nn)))
stats(nn, mutual, "mutual NN dist<25")
# ratio test: best < 0.8 * second
Ds = np.sort(D, axis=1)
ratio = m1 & (best < 25) & (Ds[:, 0] < 0.8 * Ds[:, 1])
stats(nn, ratio, "NN + ratio 0.8   ")
stats(nn, mutual & ratio, "mutual + ratio   ")
# float descriptor L2 NN
DL = np.linalg.norm(d1n[:, None, :] - d2n[None, :, :], axis=2)
DL[~m1] = 999; DL[:, ~m2] = 999
nnf = DL.argmin(1); bestf = DL.min(1)
nn2f = DL.argmin(0)
mutf = m1 & (bestf < 0.6) & (nn2f[nnf] == np.arange(len(nnf)))
stats(nnf, mutf, "float mutual<0.6 ")

print("--- capped LSP length (central window) ---")
for cap in (48, 64):
    d1c, _ = lbd.lbd_descriptors(g1, l1, jnp.asarray(m1), max_len=cap)
    d2c, _ = lbd.lbd_descriptors(g2, l2, jnp.asarray(m2), max_len=cap)
    w1c, w2c = np.asarray(lbd.binarize_lbd(d1c)), np.asarray(lbd.binarize_lbd(d2c))
    Dc = np.zeros((len(w1c), len(w2c)), int)
    for i in range(len(w1c)):
        for j in range(len(w2c)):
            Dc[i, j] = sum(pop(a ^ b) for a, b in zip(w1c[i], w2c[j]))
    Dc[~m1] = 999; Dc[:, ~m2] = 999
    nnc = Dc.argmin(1); bestc = Dc.min(1); nn2c = Dc.argmin(0)
    mutc = m1 & (bestc < 25) & (nn2c[nnc] == np.arange(len(nnc)))
    stats(nnc, mutc, f"cap{cap} mutual<25")
    stats(nnc, m1 & (bestc < 25), f"cap{cap} NN<25    ")
