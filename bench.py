"""Benchmark: prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Workload: the FULL stereo direct-SLAM pipeline (BASELINE configs 1-2 analog)
at KITTI resolution (1216x352 crop, divisible by 2^5) on a rendered synthetic
stereo sequence — tracking, depth tracing, activation, windowed BA and
marginalization, exactly the per-frame path a KITTI run executes. The
reference baseline is its published full-pipeline throughput on KITTI 05
(~18.9 fps, BASELINE.md).

Runs on whatever JAX platform the ambient environment provides (TPU under
axon; CPU elsewhere). Warmup frames (jit compilation of every pipeline stage)
are excluded from timing.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import os

    os.makedirs("/root/repo/.cache/jax", exist_ok=True)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
    import jax

    # f32 einsums/solves: TPU's default bf16 matmul precision measurably
    # degrades the Hessian assembly and the 68x68 camera-system solve
    jax.config.update("jax_default_matmul_precision", "highest")

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from stereo_dso_g2o_tpu.config import Settings
    from stereo_dso_g2o_tpu.frontend.full_system import FullSystem
    from stereo_dso_g2o_tpu.io import synthetic, trajectory
    from stereo_dso_g2o_tpu.models.camera import make_calib
    from stereo_dso_g2o_tpu.utils import se3
    import jax.numpy as jnp

    settings = Settings(
        desired_point_density=2000.0,
        desired_immature_density=1500.0,
        immature_cap=2048,
        active_cap=2048,
    )
    w, h, b = 1216, 352, 0.54
    K = synthetic.default_K(w, h, fov_deg=80.0)
    # realistic KITTI-like depths: disparity must stay inside the reference's
    # maxPixSearch cap (0.027*(w+h) ~ 42px), i.e. depth >~ 10m for this rig
    rng_scene = np.random.default_rng(0)
    scene = synthetic.PlaneScene(
        normal=np.array([0.15, -0.1, -1.0]),
        dist=-18.0,
        tex=synthetic.smooth_texture(rng_scene),
        tex_scale=6.0,
    )

    n_frames = 22
    cache = "/root/repo/.cache/bench_frames_v2.npz"
    frames = []
    poses = []
    if os.path.exists(cache):
        data = np.load(cache)
        for i in range(n_frames):
            poses.append(data[f"p{i}"])
            frames.append((data[f"l{i}"], data[f"r{i}"]))
    else:
        arrays = {}
        for i in range(n_frames):
            xi = np.array(
                [0.03 * i, -0.01 * i, 0.05 * i, 0.0015 * i, 0.003 * i, -0.0008 * i]
            )
            T = np.asarray(se3.se3_exp(jnp.asarray(xi)), dtype=np.float64)
            poses.append(np.linalg.inv(T))
            left, right, _ = synthetic.render_stereo_pair(scene, K, w, h, b, T)
            frames.append((left, right))
            arrays[f"p{i}"] = poses[-1]
            arrays[f"l{i}"] = left
            arrays[f"r{i}"] = right
        np.savez(cache, **arrays)

    calib = make_calib(K[0, 0], K[1, 1], K[0, 2], K[1, 2], b, w, h, n_levels=6)
    fs = FullSystem(calib, settings)

    # warmup: run enough frames to compile every stage (init, KF, non-KF)
    warm = 11
    for i in range(warm):
        fs.add_frame(
            np.clip(frames[i][0], 0, 255).astype(np.uint8),
            np.clip(frames[i][1], 0, 255).astype(np.uint8),
            i, timestamp=0.1 * i,
        )

    # 8-bit transfer path (reference inputs are 8-bit PNGs)
    frames8 = [
        (np.clip(l, 0, 255).astype(np.uint8), np.clip(r, 0, 255).astype(np.uint8))
        for (l, r) in frames
    ]
    t0 = time.perf_counter()
    for i in range(warm, n_frames):
        fs.add_frame(frames8[i][0], frames8[i][1], i, timestamp=0.1 * i)
    dt = (time.perf_counter() - t0) / (n_frames - warm)

    traj = fs.trajectory()
    ate = trajectory.ate_rmse(traj, poses)

    fps = 1.0 / dt
    baseline_fps = 18.9  # reference KITTI 05 full pipeline (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": "full_slam_fps_kitti_res_synthetic",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / baseline_fps, 3),
                "ate_rmse_m": round(float(ate), 4),
                "n_keyframes": len(fs.kf_shells),
            }
        )
    )


if __name__ == "__main__":
    main()
