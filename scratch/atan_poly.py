import os
os.environ["JAX_PLATFORMS"]="cpu"
import numpy as np

# atan(t)/t on t in [-(sqrt2-1), sqrt2-1]; fit in s=t^2 over [0, (sqrt2-1)^2]
T = np.sqrt(2) - 1
smax = T*T
for deg in (6, 8, 10, 12):
    # Chebyshev fit of f(s) = atan(sqrt(s))/sqrt(s) on [eps, smax]
    from numpy.polynomial import chebyshev as C
    nodes = np.cos((2*np.arange(2000)+1)/(2*2000)*np.pi)  # [-1,1]
    s = (nodes+1)/2*smax
    t = np.sqrt(np.maximum(s, 1e-300))
    f = np.where(s==0, 1.0, np.arctan(t)/t)
    cf = C.chebfit(nodes, f, deg)
    # convert to power series in s
    pows = C.cheb2poly(cf)  # in nodes = 2s/smax - 1
    # evaluate error over dense grid
    sd = np.linspace(0, smax, 100001)
    nd = 2*sd/smax - 1
    approx = C.chebval(nd, cf)
    td = np.sqrt(sd); exact = np.where(sd==0, 1.0, np.arctan(td)/np.maximum(td,1e-300))
    err = np.max(np.abs((approx - exact)*td))  # error in atan itself
    print(deg, "max atan err:", err)
    if deg == 12:
        # full atan2 check including reduction, in f64
        def atan2_poly(y, x):
            ax, ay = np.abs(x), np.abs(y)
            den = np.maximum(ax, ay); num = np.minimum(ax, ay)
            a = num / np.where(den==0, 1.0, den)
            red = a > T
            t2 = (a-1)/(a+1)
            t = np.where(red, t2, a)
            ss = t*t
            n2 = 2*ss/smax - 1
            p = C.chebval(n2, cf)
            r = t*p + np.where(red, np.pi/4, 0.0)
            r = np.where(ay > ax, np.pi/2 - r, r)
            r = np.where(x < 0, np.pi - r, r)
            return np.where(y < 0, -r, r)
        rng = np.random.default_rng(0)
        y = rng.normal(size=200000); x = rng.normal(size=200000)
        e = np.max(np.abs(atan2_poly(y,x) - np.arctan2(y,x)))
        print("atan2 max err f64:", e)
        np.save("/root/repo/scratch/atan_cheb12.npy", cf)
        print("cheb coeffs:", repr(cf))
