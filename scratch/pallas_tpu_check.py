import numpy as np, jax, jax.numpy as jnp
import sys; sys.path.insert(0, "/root/repo")
from cube_slam_wu_tpu.ops import image as image_ops
rng = np.random.default_rng(0)
edge = jnp.asarray(rng.random((480, 640)) < 0.01)
d_pallas = image_ops.distance_transform(edge, use_pallas=True)
d_ref = image_ops.distance_transform(edge, use_pallas=False)
diff = float(jnp.max(jnp.abs(d_pallas - d_ref)))
print("TPU pallas EDT max diff vs dense:", diff)
assert diff < 1e-2
print("ok")
