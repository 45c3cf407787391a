"""Exact-f32 replication of the reference computeLBD
(binary_descriptor.cpp:1150-1515) in numpy, validated against the oracle's
72-float descriptors on the cabinet fixture.  Once max|diff| ~ 1e-7 here,
the same operation ordering goes into ops/lbd.py's exact path."""
import numpy as np

D = "/tmp/lbd_oracle/"
f32 = np.float32

NUM_BANDS = 9
W_BAND = 7
HEIGHT = NUM_BANDS * W_BAND  # 63
HALF_H = (HEIGHT - 1) // 2  # 31


def gauss_coefs():
    # doubles, cast to f32 at use (binary_descriptor.cpp:146-177)
    u_l = (W_BAND * 3 - 1) // 2
    sigma_l = (W_BAND * 2 + 1) // 2
    i = np.arange(W_BAND * 3, dtype=np.float64)
    coef_l = np.exp(-((i - u_l) ** 2) / (2.0 * sigma_l * sigma_l))
    n = HEIGHT
    u_g = (n - 1) // 2
    sigma_g = float(u_g)
    j = np.arange(n, dtype=np.float64)
    coef_g = np.exp(-((j - u_g) ** 2) / (2.0 * sigma_g * sigma_g))
    return coef_l.astype(f32), coef_g.astype(f32)


def compute_lbd_exact(dx_img, dy_img, keylines):
    """keylines: rows of (x1 y1 x2 y2 angle numpix). Returns (L, 72) f32."""
    H, W = dx_img.shape
    L = len(keylines)
    kl = np.asarray(keylines, np.float64)
    sx = kl[:, 0].astype(f32); sy = kl[:, 1].astype(f32)
    ex = kl[:, 2].astype(f32); ey = kl[:, 3].astype(f32)
    angle = kl[:, 4].astype(f32)
    npix = kl[:, 5].astype(np.int32)

    dL0 = np.cos(angle.astype(np.float64)).astype(f32)
    dL1 = np.sin(angle.astype(np.float64)).astype(f32)
    dO0, dO1 = -dL1, dL0
    halfW = ((npix - 1) // 2).astype(f32)
    midx = (np.float64(0.5) * (sx + ex).astype(f32).astype(np.float64)).astype(f32)
    midy = (np.float64(0.5) * (sy + ey).astype(f32).astype(np.float64)).astype(f32)

    coef_l, coef_g = gauss_coefs()

    # row starts, accumulated sequentially in f32 over h (reference row update
    # sCorX0 -= dL[1]; sCorY0 += dL[0])
    sx0 = ((-dL0 * halfW).astype(f32) + (dL1 * np.float32(HALF_H)).astype(f32)).astype(f32) + midx
    sy0 = ((-dL1 * halfW).astype(f32) - (dL0 * np.float32(HALF_H)).astype(f32)).astype(f32) + midy
    sx0 = sx0.astype(f32); sy0 = sy0.astype(f32)

    max_np = int(npix.max())
    wmask_all = np.arange(max_np)[None, :] < npix[:, None]  # (L, maxnp)

    band_sums = np.zeros((L, NUM_BANDS, 8), f32)  # pgdL ngdL pgdO ngdO pgdL2 ngdL2 pgdO2 ngdO2
    rx0 = sx0.copy(); ry0 = sy0.copy()
    for h in range(HEIGHT):
        # inner w loop: positions + row sums accumulated in f32
        cx = rx0.copy(); cy = ry0.copy()
        pl = np.zeros(L, f32); nl = np.zeros(L, f32)
        po = np.zeros(L, f32); no = np.zeros(L, f32)
        for w in range(max_np):
            m = wmask_all[:, w]
            xi = np.clip(np.floor(cx.astype(np.float64) + 0.5).astype(np.int64), 0, W - 1)
            yi = np.clip(np.floor(cy.astype(np.float64) + 0.5).astype(np.int64), 0, H - 1)
            dxv = dx_img[yi, xi].astype(f32)
            dyv = dy_img[yi, xi].astype(f32)
            gdl = ((dxv * dL0).astype(f32) + (dyv * dL1).astype(f32)).astype(f32)
            gdo = ((dxv * dO0).astype(f32) + (dyv * dO1).astype(f32)).astype(f32)
            pl = (pl + np.where(m & (gdl > 0), gdl, f32(0))).astype(f32)
            nl = (nl + np.where(m & ~(gdl > 0), -gdl, f32(0))).astype(f32)
            po = (po + np.where(m & (gdo > 0), gdo, f32(0))).astype(f32)
            no = (no + np.where(m & ~(gdo > 0), -gdo, f32(0))).astype(f32)
            cx = (cx + dL0).astype(f32)
            cy = (cy + dL1).astype(f32)
        rx0 = (rx0 - dL1).astype(f32)
        ry0 = (ry0 + dL0).astype(f32)

        cg = coef_g[h]
        pl = (cg * pl).astype(f32); nl = (cg * nl).astype(f32)
        po = (cg * po).astype(f32); no = (cg * no).astype(f32)
        pl2 = (pl * pl).astype(f32); nl2 = (nl * nl).astype(f32)
        po2 = (po * po).astype(f32); no2 = (no * no).astype(f32)
        row = np.stack([pl, nl, po, no], axis=-1)
        row2 = np.stack([pl2, nl2, po2, no2], axis=-1)

        band = h // W_BAND
        c = coef_l[h % W_BAND + W_BAND]
        band_sums[:, band, :4] = (band_sums[:, band, :4] + (c * row).astype(f32)).astype(f32)
        band_sums[:, band, 4:] = (band_sums[:, band, 4:] + ((c * c).astype(f32) * row2).astype(f32)).astype(f32)
        if band - 1 >= 0:
            c = coef_l[h % W_BAND + 2 * W_BAND]
            band_sums[:, band - 1, :4] = (band_sums[:, band - 1, :4] + (c * row).astype(f32)).astype(f32)
            band_sums[:, band - 1, 4:] = (band_sums[:, band - 1, 4:] + ((c * c).astype(f32) * row2).astype(f32)).astype(f32)
        if band + 1 < NUM_BANDS:
            c = coef_l[h % W_BAND]
            band_sums[:, band + 1, :4] = (band_sums[:, band + 1, :4] + (c * row).astype(f32)).astype(f32)
            band_sums[:, band + 1, 4:] = (band_sums[:, band + 1, 4:] + ((c * c).astype(f32) * row2).astype(f32)).astype(f32)

    invN2 = f32(1.0 / (W_BAND * 2.0))
    invN3 = f32(1.0 / (W_BAND * 3.0))
    invN = np.where((np.arange(NUM_BANDS) == 0) | (np.arange(NUM_BANDS) == NUM_BANDS - 1), invN2, invN3).astype(f32)
    mean = (band_sums[:, :, :4] * invN[None, :, None]).astype(f32)
    ex2 = (band_sums[:, :, 4:] * invN[None, :, None]).astype(f32)
    var = (ex2 - (mean * mean).astype(f32)).astype(f32)
    std = np.sqrt(np.maximum(var, 0)).astype(f32)

    desc = np.concatenate([mean, std], axis=-1)  # (L, 9, 8)

    # normalization: sequential f32 sum in reference order (band-major, 4 means then... actually
    # reference loops bands, adding the 4 mean squares to tempM and 4 std squares to tempS per band)
    tempM = np.zeros(L, f32); tempS = np.zeros(L, f32)
    for b in range(NUM_BANDS):
        for j in range(4):
            tempM = (tempM + (desc[:, b, j] * desc[:, b, j]).astype(f32)).astype(f32)
        for j in range(4, 8):
            tempS = (tempS + (desc[:, b, j] * desc[:, b, j]).astype(f32)).astype(f32)
    tempM = (f32(1.0) / np.sqrt(tempM).astype(f32)).astype(f32)
    tempS = (f32(1.0) / np.sqrt(tempS).astype(f32)).astype(f32)
    out = desc.copy()
    out[:, :, :4] = (desc[:, :, :4] * tempM[:, None, None]).astype(f32)
    out[:, :, 4:] = (desc[:, :, 4:] * tempS[:, None, None]).astype(f32)

    # 0.4 clipping: comparison in double (desVec[i] > 0.4)
    clip = out.astype(np.float64) > 0.4
    out = np.where(clip, f32(0.4), out).astype(f32)

    # re-normalize, sequential f32
    temp = np.zeros(L, f32)
    flat = out.reshape(L, 72)
    for i in range(72):
        temp = (temp + (flat[:, i] * flat[:, i]).astype(f32)).astype(f32)
    temp = (f32(1.0) / np.sqrt(temp).astype(f32)).astype(f32)
    flat = (flat * temp[:, None]).astype(f32)
    return flat


def main():
    dx = np.loadtxt(D + "cabinet_dx.txt").astype(np.int16)
    dy = np.loadtxt(D + "cabinet_dy.txt").astype(np.int16)
    kls = np.loadtxt(D + "cabinet_desc_keylines.txt")
    ref72 = np.loadtxt(D + "cabinet_desc_desc72.txt").astype(np.float32)
    mine = compute_lbd_exact(dx, dy, kls[:, :6])
    d = np.abs(mine - ref72)
    print("desc72 max|diff|:", d.max(), " mean:", d.mean())
    worst = np.unravel_index(np.argmax(d), d.shape)
    print("worst at line", worst, "mine", mine[worst], "ref", ref72[worst])

    # binary comparison
    COMB = [(0,1),(0,2),(0,3),(0,4),(0,5),(0,6),(1,2),(1,3),(1,4),(1,5),(1,6),
            (2,3),(2,4),(2,5),(2,6),(2,7),(2,8),(3,4),(3,5),(3,6),(3,7),(3,8),
            (4,5),(4,6),(4,7),(4,8),(5,6),(5,7),(5,8),(6,7),(6,8),(7,8)]
    def binarize(desc):
        L = desc.shape[0]
        d9 = desc.reshape(L, 9, 8)
        by = np.zeros((L, 32), np.uint8)
        for ci, (a, b) in enumerate(COMB):
            bits = d9[:, a, :] > d9[:, b, :]
            by[:, ci] = (bits * (1 << np.arange(8))[None, :]).sum(axis=1).astype(np.uint8)
        return by
    ref256 = np.loadtxt(D + "cabinet_desc_desc256.txt").astype(np.uint8)
    mine256 = binarize(mine)
    refbits = np.unpackbits(ref256, axis=1)
    minebits = np.unpackbits(mine256, axis=1)
    print("binary: bytes equal:", (mine256 == ref256).all(), " bit flips:", int((refbits != minebits).sum()), "/", refbits.size)


if __name__ == "__main__":
    main()
