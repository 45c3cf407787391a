import numpy as np
from numpy.polynomial import chebyshev as C
T = np.sqrt(2) - 1
smax = T*T
nodes = np.cos((2*np.arange(2000)+1)/(2*2000)*np.pi)
s = (nodes+1)/2*smax
t = np.sqrt(np.maximum(s, 1e-300))
f = np.where(s==0, 1.0, np.arctan(t)/t)
cf = C.chebfit(nodes, f, 10)
pw = C.cheb2poly(cf)  # power series in n = 2s/smax - 1
print("power-in-n coeffs (low->high):")
print(",\n".join(f"    {c!r}" for c in pw))
# validate Horner in n
sd = np.linspace(0, smax, 100001)
nd = 2*sd/smax - 1
acc = np.zeros_like(nd)
for c in pw[::-1]:
    acc = acc*nd + c
td = np.sqrt(sd); exact = np.where(sd==0,1.0,np.arctan(td)/np.maximum(td,1e-300))
print("horner max atan err:", np.max(np.abs((acc-exact)*td)))
