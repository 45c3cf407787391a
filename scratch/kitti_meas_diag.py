"""Per-frame measurement audit on the diverging 100-frame scene: lift each
accepted camera-frame measurement to world with the TRUE pose and compare
to the ground-truth objects."""
import os, sys
import jax
os.environ["JAX_PLATFORMS"] = "cpu"
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, "/root/repo")
import numpy as np, jax.numpy as jnp
from cube_slam_wu_tpu.utils import synth
from cube_slam_wu_tpu.slam import pipeline, tracker
from cube_slam_wu_tpu.core.se3 import SE3
from cube_slam_wu_tpu.core.cuboid import Cuboid

seq = synth.make_sequence(n_frames=100, n_objects=6, size=(240, 320),
                          speed=0.5, curve=0.002, noise_px=0.8,
                          dropout=0.05, seed=4)
out, det_dir, poses_path = synth.write_kitti_sequence(seq, "/tmp/kmd")
specs = [(out / "image_0" / f"{i:06d}.png", det_dir / f"{i:06d}.txt")
         for i in range(100)]
T0 = jnp.asarray(seq.T_wc[0])
first = SE3.from_rot_trans(T0[:3, :3], T0[:3, 3])
frames, rep = pipeline.run_online_frontend(
    specs, seq.K, first, jnp.float64, max_objects=12, max_detections=4,
    min_iou=0.25)
print(rep.summary())
gt = np.stack([o.pos for o in seq.objects])
has = np.asarray(frames.has_meas)
m9 = np.asarray(frames.meas.to_minimal())
for o in range(12):
    fr = np.nonzero(has[:, o])[0]
    if fr.size == 0:
        continue
    errs = []
    for i in fr:
        Twc = SE3.from_rot_trans(jnp.asarray(seq.T_wc[i][:3, :3]),
                                 jnp.asarray(seq.T_wc[i][:3, 3]))
        cw = Cuboid.from_minimal(jnp.asarray(m9[i, o])).transform_from(Twc)
        p = np.asarray(cw.pose.trans)
        errs.append(float(np.linalg.norm(gt - p, axis=1).min()))
    errs = np.asarray(errs)
    print(f"track {o}: frames {fr[0]}-{fr[-1]} n={fr.size} "
          f"meas err median {np.median(errs):.2f} max {errs.max():.2f} "
          f"(bad frames: {fr[errs > 2].tolist()[:8]})")
