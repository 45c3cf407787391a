"""Prototype: pin down OpenCV-exact blur/Sobel and computeLBD band math in
numpy before wiring it into ops/lbd.py.  Compares against /tmp/lbd_oracle
dumps from tools/ref_oracle/lbd_oracle."""
import numpy as np

D = "/tmp/lbd_oracle/"


def load(p):
    return np.loadtxt(D + p)




def gaussian_kernel5_sigma1():
    # cv::getGaussianKernel(5, 1): computed in double, normalized
    x = np.arange(5, dtype=np.float64) - 2
    k = np.exp(-(x * x) / (2.0 * 1.0 * 1.0))
    return k / k.sum()


def reflect101_pad(a, r):
    return np.pad(a, r, mode="reflect")  # numpy 'reflect' == OpenCV BORDER_REFLECT_101


def round_half_even(x):
    return np.rint(x)


def blur_u8(img_u8):
    k = gaussian_kernel5_sigma1()
    a = reflect101_pad(img_u8.astype(np.float64), 2)
    # separable conv, horizontal then vertical (order shouldn't matter in f64)
    h = sum(k[i] * a[:, i : i + img_u8.shape[1]] for i in range(5))
    v = sum(k[i] * h[i : i + img_u8.shape[0], :] for i in range(5))
    return np.clip(round_half_even(v), 0, 255).astype(np.uint8)


def sobel3_i16(img_u8):
    a = reflect101_pad(img_u8.astype(np.int32), 1)
    H, W = img_u8.shape
    # smooth [1 2 1] vertical, diff [-1 0 1] horizontal for dx
    sm_v = a[0 : H, :] + 2 * a[1 : H + 1, :] + a[2 : H + 2, :]
    dx = sm_v[:, 2 : W + 2] - sm_v[:, 0:W]
    sm_h = a[:, 0:W] + 2 * a[:, 1 : W + 1] + a[:, 2 : W + 2]
    dy = sm_h[2 : H + 2, :] - sm_h[0:H, :]
    return dx.astype(np.int16), dy.astype(np.int16)


def main():
    from PIL import Image

    img = np.asarray(Image.open("/root/reference/line_lbd/data/cabinet.png").convert("L"))
    ref_blur = load("cabinet_blur.txt").astype(np.int64)
    my_blur = blur_u8(img)
    diff = my_blur.astype(np.int64) - ref_blur
    print("blur: shape", img.shape, "max|diff|", np.abs(diff).max(), "n_diff", (diff != 0).sum())

    ref_dx = load("cabinet_dx.txt").astype(np.int64)
    ref_dy = load("cabinet_dy.txt").astype(np.int64)
    dx, dy = sobel3_i16(ref_blur.astype(np.uint8))  # use ref blur to isolate sobel
    print("sobel dx: max|diff|", np.abs(dx - ref_dx).max(), "dy:", np.abs(dy - ref_dy).max())

    dx2, dy2 = sobel3_i16(my_blur)
    print("full grad path dx max|diff|", np.abs(dx2 - ref_dx).max(), "dy:", np.abs(dy2 - ref_dy).max())


if __name__ == "__main__":
    main()
