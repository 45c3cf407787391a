"""Why does one chimera track survive the depth gate?  Trace per-track
accepted ranges + world-lifted measurement errors with gates ON."""
import os, sys
import jax
os.environ["JAX_PLATFORMS"] = "cpu"
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, "/root/repo")
import numpy as np, jax.numpy as jnp
from cube_slam_wu_tpu.utils import synth
from cube_slam_wu_tpu.slam import pipeline
from cube_slam_wu_tpu.core.se3 import SE3
from cube_slam_wu_tpu.core.cuboid import Cuboid

seq = synth.make_sequence(n_frames=100, n_objects=6, size=(240, 320),
                          speed=0.5, curve=0.002, noise_px=0.8,
                          dropout=0.05, seed=4)
out, det_dir, poses_path = synth.write_kitti_sequence(seq, "/tmp/kgd")
specs = [(out / "image_0" / f"{i:06d}.png", det_dir / f"{i:06d}.txt")
         for i in range(100)]
T0 = jnp.asarray(seq.T_wc[0])
first = SE3.from_rot_trans(T0[:3, :3], T0[:3, 3])
frames, rep = pipeline.run_online_frontend(
    specs, seq.K, first, jnp.float64, max_objects=12, max_detections=4,
    min_iou=0.25, track_max_age=12, depth_gate_m=2.5)
print(rep.summary())
gt = np.stack([o.pos for o in seq.objects])
has = np.asarray(frames.has_meas)
m9 = np.asarray(frames.meas.to_minimal())
cam0 = np.asarray(T0)[:3, 3]
for o in range(12):
    fr = np.nonzero(has[:, o])[0]
    if fr.size == 0:
        continue
    errs, rngs, nearest = [], [], []
    for i in fr:
        Twc = SE3.from_rot_trans(jnp.asarray(seq.T_wc[i][:3, :3]),
                                 jnp.asarray(seq.T_wc[i][:3, 3]))
        cw = Cuboid.from_minimal(jnp.asarray(m9[i, o])).transform_from(Twc)
        p = np.asarray(cw.pose.trans)
        d = np.linalg.norm(gt - p, axis=1)
        errs.append(float(d.min()))
        nearest.append(int(d.argmin()))
        # range as the front-end computes it: fixed-pose lift pos - cam0
        cl = Cuboid.from_minimal(jnp.asarray(m9[i, o])).transform_from(first)
        rngs.append(float(np.linalg.norm(np.asarray(cl.pose.trans) - cam0)))
    errs = np.asarray(errs); rngs = np.asarray(rngs)
    print(f"track {o}: frames {fr[0]}-{fr[-1]} n={fr.size} "
          f"err med {np.median(errs):.2f} max {errs.max():.2f}")
    if errs.max() > 2:
        for k in range(fr.size):
            flag = " <-- BAD" if errs[k] > 2 else ""
            print(f"   f{fr[k]:3d} gt_obj={nearest[k]} err={errs[k]:6.2f} "
                  f"rng={rngs[k]:6.2f}{flag}")
