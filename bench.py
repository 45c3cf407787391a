"""Benchmark: cuboid-proposal frames/s/chip on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The headline metric is the throughput of the flagship kernel — the full
cuboid-proposal hypothesis grid for one 2D detection at VGA resolution
(Canny + exact EDT + hypothesis corner/scoring grid + fusion + lifting),
which is the dominant per-frame cost of the reference's online mode
(SURVEY.md section 3.1).  `vs_baseline` compares against 10 frames/s, the
order-of-magnitude of the reference's single-threaded C++ proposal stage on
a desktop CPU (the repo publishes no numbers — BASELINE.md — so this is the
documented ballpark of its tictoc "One 3D object total time" at VGA).

Timing methodology: the session reaches the TPU through a relay whose
round-trip (~30 ms) dwarfs kernel times and whose ack does not honour
block_until_ready, so each measurement runs N kernel iterations *inside one
jit call* chained through a serializing carry (defeats CSE/hoisting) and
fetches a scalar; per-iteration time is the slope between two N values.

Secondary numbers (BA ms/iter, end-to-end) go to stderr.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

BASELINE_FPS = 10.0


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _timed_loop(make_step, n_lo=4, n_hi=64):
    """Return seconds/iteration measured on device.

    make_step() -> f(n) running n chained kernel iterations inside ONE
    compiled program (dynamic fori_loop trip count, so both n values share
    a single executable — cold-compile cost halves vs two static scans).
    Uses the slope between n_lo and n_hi to cancel relay RTT + fixed
    overhead.
    """
    f = make_step()
    n_lo_d = np.int32(n_lo)
    n_hi_d = np.int32(n_hi)
    float(np.asarray(f(n_lo_d)))  # compile (shared executable)
    float(np.asarray(f(n_hi_d)))

    def best_of(n, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(f(n)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_lo = best_of(n_lo_d)
    t_hi = best_of(n_hi_d)
    return max((t_hi - t_lo) / (n_hi - n_lo), 1e-9)


def main():
    global _T_START
    _T_START = time.perf_counter()
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: compile time through the TPU relay is
    # the bench's dominant and most variable cost (first proposal section:
    # 46 s warm vs 1082 s cold across driver runs); cached executables make
    # repeat runs — including the driver's end-of-round run — measurement-
    # bound.  Lives under ~/.cache (durable across /tmp wipes); any failure
    # to set it degrades to cold compiles, never breaks the bench.
    try:
        import os

        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "jax_bench_cache"
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as e:
        _log(f"compilation cache unavailable: {e}")

    dev = jax.devices()[0]
    _log(f"device: {dev} ({dev.platform})")
    dtype = jnp.float32

    # ---- flagship: proposal engine on real fixture-shaped inputs ----------
    from cube_slam_wu_tpu.ops.proposal import ProposalConfig, detect_cuboid_single
    from cube_slam_wu_tpu.utils import io as uio

    try:
        base = "/root/reference/detect_3d_cuboid/data/"
        gray_np = uio.load_image_gray(base + "0000_rgb_raw.jpg")
        edges = uio.read_number_txt(base + "edge_detection/LSD/0000_edge.txt")
        bbox_np = np.array([187.0, 188.0, 201.0, 311.0])
    except OSError:
        rng = np.random.default_rng(0)
        gray_np = rng.integers(0, 255, size=(480, 640)).astype(float)
        edges = rng.uniform(0, 400, size=(200, 4))
        bbox_np = np.array([150.0, 100.0, 220.0, 300.0])

    L = 320
    lines = np.zeros((L, 4))
    lines[: min(len(edges), L)] = edges[: min(len(edges), L), :4]
    mask = np.zeros(L, bool)
    mask[: min(len(edges), L)] = True

    gray = jnp.asarray(gray_np, dtype)
    K = jnp.asarray([[529.5, 0, 365.0], [0, 529.5, 265.0], [0, 0, 1.0]], dtype)
    T_wc = jnp.asarray(
        [
            [1, 0.0011, 0.0004, 0],
            [0, -0.3376, 0.9413, 0],
            [0.0011, -0.9413, -0.3376, 1.35],
            [0, 0, 0, 1.0],
        ],
        dtype,
    )
    bbox = jnp.asarray(bbox_np, dtype)
    lines_j = jnp.asarray(lines, dtype)
    mask_j = jnp.asarray(mask)
    # headline: reference-parity configuration (int-cast chamfer lookups,
    # box_proposal_detail.cpp:327 semantics).  The production online config
    # (bilinear_dist for f32-stable ranking) is measured as a secondary
    # number below: bilinear fundamentally costs ~2x the gather elements
    # even with the f16 tap-pair packing.
    cfg = ProposalConfig(max_lines=L, sample_cam_roll_pitch=True)
    cfg_prod = ProposalConfig(
        max_lines=L,
        sample_cam_roll_pitch=True,
        rank_margin=2e-3,
        bilinear_dist=True,
        nominal_skew_ratio=2.0,
    )

    def make_proposal_loop(c):
        @jax.jit
        def run(n):
            def body(_, carry):
                # carry*1e-32 underflows to +0 in f32 (gray is O(100)) so
                # the inputs are bit-identical every iteration, but unlike
                # carry*0.0 the product is not algebraically foldable —
                # the serializing chain survives XLA simplification
                res = detect_cuboid_single(
                    gray + carry * 1e-32, K, T_wc, bbox, lines_j, mask_j, c
                )
                return jnp.sum(res.pos)

            return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, dtype))

        return run

    t0 = time.perf_counter()
    sec_per_frame = _timed_loop(functools.partial(make_proposal_loop, c=cfg))
    fps = 1.0 / sec_per_frame
    _log(
        f"proposal (25 roll/pitch x 16 yaw grid): {sec_per_frame * 1e3:.2f} ms "
        f"-> {fps:.1f} obj-frames/s/chip (measured in {time.perf_counter() - t0:.0f}s)"
    )
    try:
        sec_prod = _timed_loop(functools.partial(make_proposal_loop, c=cfg_prod))
        _log(
            f"proposal, production online config (packed-bilinear chamfer): "
            f"{sec_prod * 1e3:.2f} ms -> {1.0 / sec_prod:.1f} obj-frames/s/chip"
        )
    except Exception as e:
        sec_prod = sec_per_frame
        _log(f"production-config bench skipped: {e}")

    # ---- roofline: speed-of-light model vs measured ------------------------
    # Round-4 attribution (scratch/stage_ablate_r4.py + micro_r4.py): the
    # parity grid is chamfer gathers (~4.1 ms) + Canny/EDT map (~1.0 ms
    # after bit-packed hysteresis + Pallas row EDT) + capped ROI merge
    # (~0.4 ms) + ~0.2 ms of scoring arithmetic.  TPU gathers are
    # rate-bound per ELEMENT (scratch/gather_bench.log: same ns/elem for an
    # 8x128 map as for 480x640, i.e. VMEM residency does not help — which is
    # why the hand-fused Pallas attempt measured 0.99x and was removed).
    # Model: elements_gathered x measured take-rate.
    try:
        npx = int(gray.shape[0]) * int(gray.shape[1])
        flat_map = jnp.asarray(
            np.random.default_rng(2).random(npx).astype(np.float32), dtype
        )
        # parity config taps: 11 samples x 9 edges (config 1, capped) +
        # 11 x 7 (config 2, capped)
        elems = cfg.dist_gather_cap * 99 + cfg.dist_gather_cap2 * 77
        idx_np = np.random.default_rng(3).integers(0, npx, size=elems)
        idx0 = jnp.asarray(idx_np, jnp.int32)

        def make_gather_loop():
            @jax.jit
            def run(n):
                def body(_, carry):
                    idx = (idx0 + carry) % npx
                    v = jnp.take(flat_map, idx)
                    # keep a REAL data dependency on the gathered values so
                    # the x*0 -> 0 algebraic rewrite can't dead-code the take
                    return carry + 1 + (jnp.sum(v) * 1e-30).astype(jnp.int32)

                return jax.lax.fori_loop(0, n, body, jnp.asarray(0, jnp.int32))

            return run

        sec_gather = _timed_loop(make_gather_loop)
        rate_ns = sec_gather / elems * 1e9
        model_parity_ms = elems * rate_ns * 1e-6
        model_prod_ms = 2 * elems * rate_ns * 1e-6  # bilinear: 2 packed rows
        _log(
            f"roofline[gather]: measured take-rate {rate_ns:.2f} ns/elem; "
            f"proposal parity model {model_parity_ms:.2f} ms "
            f"({elems} elems) vs measured {sec_per_frame * 1e3:.2f} ms "
            f"-> {100 * model_parity_ms / (sec_per_frame * 1e3):.0f}% of "
            f"gather-roofline; production model {model_prod_ms:.2f} ms vs "
            f"{sec_prod * 1e3:.2f} ms "
            f"-> {100 * model_prod_ms / (sec_prod * 1e3):.0f}%"
        )
        _log(
            "roofline[BA]: F=64 graph is n=393 unknowns, r=1216 residuals "
            "-> ~4e8 flops/iter = ~8 us MXU floor; measured ms/iter below "
            "is the small-graph latency-bound regime (hundreds of tiny "
            "kernels), not a compute ceiling"
        )
    except Exception as e:
        _log(f"roofline probes skipped: {e}")

    # ---- secondary: BA ms/iter size sweep ---------------------------------
    # F in {64, 256, 1024}: shows where the dense-MXU formulation crosses out
    # of the launch-latency-bound small-graph regime (VERDICT r4 weak 4).
    try:
        from cube_slam_wu_tpu.core.cuboid import Cuboid
        from cube_slam_wu_tpu.core.se3 import SE3
        from cube_slam_wu_tpu.slam import ba
        from cube_slam_wu_tpu.slam.graph import CameraObjectGraph

        def build_graph(F):
            rng = np.random.default_rng(1)
            tang = jnp.asarray(rng.normal(size=(F, 6)) * 0.05, dtype)
            Tcw = SE3.exp(tang)
            odom_parts = [SE3.identity((), dtype)] + [
                Tcw[i].compose(Tcw[i - 1].inverse()) for i in range(1, F)
            ]
            odom = jax.tree.map(lambda *xs: jnp.stack(xs), *odom_parts)
            cube = Cuboid.from_minimal(
                jnp.asarray([0.5, 2.0, 0.3, 0, 0, 0.7, 0.4, 0.3, 0.3], dtype)
            )
            meas = cube.transform_to(Tcw.inverse())
            meas = jax.tree.map(lambda x: x[:, None], meas)
            return CameraObjectGraph.empty(F, 1, dtype)._replace(
                cam_Tcw=SE3.exp(tang + 0.01),
                cube=jax.tree.map(lambda x: x[None], cube),
                frame_mask=jnp.ones(F, bool),
                cube_valid=jnp.ones(1, bool),
                odom=odom,
                odom_mask=jnp.arange(F) > 0,
                cube_meas=meas,
                cube_meas_weight=jnp.full((F, 1), 1.8, dtype),
                cube_meas_mask=jnp.ones((F, 1), bool),
            )

        def make_ba_loop(graph):
            @jax.jit
            def run(n):
                def body(_, carry):
                    g = graph._replace(
                        cam_Tcw=SE3(
                            graph.cam_Tcw.quat, graph.cam_Tcw.trans + carry
                        )
                    )
                    res = ba.optimize(g, iterations=1)
                    # sub-denormal carry: exact-zero perturbation, real chain
                    return jnp.sum(res.cam_Tcw.trans) * 1e-42

                return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, dtype))

            return run

        ba_rows = []
        for F in (64, 256, 1024):
            g = build_graph(F)
            ms = _timed_loop(
                functools.partial(make_ba_loop, g), n_lo=4, n_hi=32
            ) * 1e3
            ba_rows.append((F, ms))
            _log(f"BA F={F}: {ms:.3f} ms/iter")
        small, mid, big = (r[1] for r in ba_rows)
        _log(
            "roofline[BA-sweep]: ms/iter x"
            f"{mid / small:.1f} at 4x frames, x{big / small:.1f} at 16x — "
            "the F=64 point is launch-latency-bound (0.4 GFLOP/iter would "
            "be ~8 us at MXU rate), while the growth beyond F=256 tracks "
            "the dense (r x n) Jacobian/Hessian materialization "
            "(O(F^2) memory, O(F^3) solve) that replaces g2o's sparse "
            "block solver — the windowed/Schur paths (slam/window.py, "
            "slam/point_ba.py) exist precisely so production never runs "
            "full dense BA at these sizes"
        )
        try:
            # kernel-count attribution for the small-graph regime: how many
            # fused kernels one LM iteration compiles to (the "hundreds of
            # tiny kernels" claim, measured not asserted)
            txt = (
                jax.jit(lambda g: ba.optimize(g, iterations=1))
                .lower(build_graph(64))
                .compile()
                .as_text()
            )
            n_fus = txt.count(" fusion(") + txt.count(" fusion.")
            n_ops = sum(
                1 for ln in txt.splitlines() if " = " in ln and "ROOT" not in ln
            )
            _log(
                f"attribution[BA F=64]: compiled module has ~{n_fus} fusion "
                f"kernels / {n_ops} HLO ops for 1 LM iteration"
            )
        except Exception as e:
            _log(f"BA attribution skipped: {e}")
    except Exception as e:  # secondary metrics must not break the headline
        _log(f"BA bench skipped: {e}")

    # ---- secondary: line detection + LBD + matching (BASELINE config 2) ----
    # Per VIDEO frame: detect + describe + binarize the new frame and match
    # it against the previous frame's codes (the reference's
    # detect_descrip_lines + match_line_descrip flow,
    # line_lbd_allclass.cpp:239-369) — on the real TUM pair.
    try:
        from cube_slam_wu_tpu.ops import lbd as lbd_ops
        from cube_slam_wu_tpu.ops.detect import detect_line_segments as _dls

        tum = "/root/reference/object_slam/data/raw_imgs/"
        g1 = jnp.asarray(uio.load_image_gray(tum + "0000_rgb_raw.jpg"), jnp.float32)
        g2 = jnp.asarray(uio.load_image_gray(tum + "0001_rgb_raw.jpg"), jnp.float32)

        def make_match_loop():
            l1, m1 = _dls(g1)
            d1, _ = lbd_ops.lbd_descriptors(g1, l1, m1)
            w1 = lbd_ops.binarize_lbd(d1)

            @jax.jit
            def run(n):
                def body(_, carry):
                    l2, m2 = _dls(g2 + carry)
                    d2, _ = lbd_ops.lbd_descriptors(g2 + carry, l2, m2)
                    w2 = lbd_ops.binarize_lbd(d2)
                    idx, dist, matched = lbd_ops.hamming_match(w2, w1, m2, m1)
                    # sub-denormal carry: exact-zero perturbation, real chain
                    return jnp.sum(jnp.where(matched, dist, 0)).astype(
                        jnp.float32
                    ) * 1e-42

                return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, jnp.float32))

            return run

        line_ms = _timed_loop(make_match_loop, n_lo=2, n_hi=8) * 1e3
        # match-quality numbers (once, not timed)
        l1, m1 = _dls(g1)
        l2, m2 = _dls(g2)
        d1, _ = lbd_ops.lbd_descriptors(g1, l1, m1)
        d2, _ = lbd_ops.lbd_descriptors(g2, l2, m2)
        w1, w2 = lbd_ops.binarize_lbd(d1), lbd_ops.binarize_lbd(d2)
        _, _, nn_m = lbd_ops.hamming_match(w2, w1, m2, m1)
        _, _, mut_m = lbd_ops.match_lines_filtered(w2, w1, m2, m1)
        n_nn = int(np.asarray(jnp.sum(nn_m)))
        n_mut = int(np.asarray(jnp.sum(mut_m)))
        # agreement with the reference matcher: exact on its own descriptors
        # (tests/test_lbd_oracle_parity.py::test_matcher_parity pins identical
        # Hamming distances + the same dist<25 acceptance set)
        _log(
            f"line detect+LBD+match (TUM frame pair): {line_ms:.1f} ms/frame "
            f"-> {1e3 / line_ms:.1f} pairs/s/chip; matches dist<25: {n_nn} "
            f"({int(np.asarray(jnp.sum(m2)))} query lines), mutual-consistent: "
            f"{n_mut}; matcher vs reference MIH: distances exact, acceptance "
            f"set identical (test_lbd_oracle_parity)"
        )
    except Exception as e:
        _log(f"line-matching bench skipped: {e}")

    # ---- secondary: line detector + end-to-end online frame ---------------
    try:
        from cube_slam_wu_tpu.ops.detect import detect_line_segments

        def make_detect_loop():
            @jax.jit
            def run(n):
                def body(_, carry):
                    lines, m = detect_line_segments(gray + carry)
                    # sub-denormal carry: exact-zero perturbation, real chain
                    return jnp.sum(jnp.where(m, lines[:, 0], 0.0)) * 1e-42

                return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, dtype))

            return run

        det_ms = _timed_loop(make_detect_loop, n_lo=2, n_hi=8) * 1e3
        try:
            # detector roofline: its wall is the (peaks x bins x taps)
            # support gather, rate-bound like the chamfer
            import math as _math

            from cube_slam_wu_tpu.ops.detect import DetectConfig

            dc = DetectConfig()
            nb = int(_math.hypot(*gray.shape) / dc.t_bin) + 2
            n_perp = int(_math.ceil(dc.inlier_rho_tol)) * 2 + 1
            det_elems = dc.n_peaks * nb * n_perp
            det_model_ms = det_elems * rate_ns * 1e-6
            _log(
                f"roofline[detector]: support gather {det_elems} elems -> "
                f"{det_model_ms:.2f} ms model vs {det_ms:.1f} ms measured "
                f"-> {100 * det_model_ms / det_ms:.0f}% of gather-roofline "
                f"(remainder: Hough scatter, edge top_k, run extraction, "
                f"merge — scratch/detect_ablate_r4.py)"
            )
        except Exception as e:
            _log(f"detector roofline skipped: {e}")
        online_ms = det_ms + sec_prod * 1e3  # the online path runs cfg_prod
        pp_ms = max(det_ms, sec_prod * 1e3)
        _log(
            f"line detector: {det_ms:.1f} ms/frame; online front-end "
            f"(detect + proposal): {online_ms:.1f} ms -> {1e3 / online_ms:.1f} frames/s/chip; "
            f"2-chip detect|propose pipeline (parallel/pipelined.py, "
            f"per-frame poses -> serves the interleaved production config): "
            f"steady-state 1/max(stages) = {1e3 / pp_ms:.1f} frames/s"
        )
    except Exception as e:
        _log(f"detector bench skipped: {e}")

    # ---- headline JSON -----------------------------------------------------
    # Printed BEFORE the end-to-end section: the e2e run is the longest and
    # most relay-variance-exposed stage (a cold compile through the tunnel
    # has blown a 12x budget before), and a driver-side timeout there must
    # never cost the headline metric.  stdout carries exactly this one line;
    # everything else goes to stderr.
    print(
        json.dumps(
            {
                "metric": "cuboid_proposal_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 2),
            }
        ),
        flush=True,
    )

    # ---- end-to-end online SLAM: the REAL bundled 58-frame TUM sequence ----
    # The dataset the reference actually ships and drives
    # (object_slam/data/, main_obj.cpp:541-835), run through the fused
    # single-dispatch online step (slam/online.py): per frame ONE jitted
    # call takes (image, yolo boxes) and returns (pose, report scalars) —
    # association, tracklet bookkeeping, measurement assembly and the
    # 5-iteration incremental BA all on device.  Wall clock inclusive of
    # host image IO and the per-frame pose pull.
    try:
        from cube_slam_wu_tpu.slam.online import run_online_slam_fused
        from cube_slam_wu_tpu.utils.metrics import ate_rmse

        if time.perf_counter() - _T_START > 1500.0:
            # relay/compile variance blew the budget (the headline JSON is
            # already printed above; full e2e numbers: BASELINE.md)
            raise RuntimeError("time budget exceeded, skipping e2e section")
        base = "/root/reference/object_slam/data"
        truth = uio.read_number_txt(base + "/truth_cam_poses.txt")
        n_e2e = len(truth)

        # RTT probe: the session tunnels to the TPU through a relay; every
        # host<->device sync pays this.  Report it so the e2e number can be
        # read against a locally-attached deployment.
        trivial = jax.jit(lambda x: x + 1.0)
        float(np.asarray(trivial(jnp.asarray(1.0, dtype))))
        rtts = []
        for _ in range(10):
            t0 = time.perf_counter()
            float(np.asarray(trivial(jnp.asarray(1.0, dtype))))
            rtts.append(time.perf_counter() - t0)
        rtt_ms = 1e3 * float(np.median(rtts))

        # f32 matmul precision: the TPU's default bf16 matmul passes degrade
        # the BA solves enough to drift the trajectory (measured: ATE 9.7 m
        # vs 0.7 m); production serving runs the back-end at full f32
        # accumulation — the matmuls here are microseconds.
        with jax.default_matmul_precision("highest"):
            # warm-up over 3 frames at full capacity compiles both step
            # variants (frame-0 and roll/pitch-sampling) + the final pulls
            run_online_slam_fused(
                base, n_frames=3, dtype=jnp.float32, capacity=n_e2e
            )
            t0 = time.perf_counter()
            result = run_online_slam_fused(base, dtype=jnp.float32)
            wall = time.perf_counter() - t0
        ate = ate_rmse(result.traj_Twc_xyzq[:, :3], truth[:, 1:4])
        _log(
            f"end-to-end online SLAM, real TUM fr3-cabinet 58 frames "
            f"(fused step: detect+propose+associate+incremental-BA in one "
            f"dispatch): {wall / n_e2e * 1e3:.0f} ms/frame -> "
            f"{n_e2e / wall:.2f} frames/s/chip wall-clock; ATE "
            f"{ate:.4f} m vs reference committed 0.2205; measured "
            f"{result.syncs_per_frame:.0f} blocking sync/frame, "
            f"{result.bytes_up_per_frame / 1e6:.2f} MB up + "
            f"{result.bytes_down_per_frame:.0f} B down per frame "
            f"(device RTT via relay {rtt_ms:.1f} ms); report "
            f"{result.report}"
        )
    except Exception as e:
        _log(f"end-to-end bench skipped: {e}")


if __name__ == "__main__":
    main()
