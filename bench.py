"""Benchmark: prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Current workload: MODE_STEREOMATCH (BASELINE config 3) at KITTI resolution
(1216x352 crop, divisible by 2^5) on synthetic stereo frames — pyramid build +
pixel selection + batched L->R/R->L epipolar trace, the per-frame hot path of
the depth subsystem. vs_baseline is measured against the reference's published
full-pipeline throughput (~18.9 fps on KITTI 05, BASELINE.md) until the full
SLAM loop lands; the metric name makes the workload explicit.

Runs on whatever JAX platform the ambient environment provides (TPU under
axon; CPU elsewhere).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from stereo_dso_g2o_tpu.config import Settings
    from stereo_dso_g2o_tpu.frontend.stereo_match import stereo_match_points
    from stereo_dso_g2o_tpu.io import synthetic
    from stereo_dso_g2o_tpu.ops.pyramid import build_pyramid
    from stereo_dso_g2o_tpu.ops.selector import block_thresholds, map_to_points, select

    settings = Settings(desired_immature_density=1500.0, immature_cap=2048)
    w, h, b = 1216, 352, 0.54
    n_levels = 6
    K = synthetic.default_K(w, h, fov_deg=80.0)
    scene = synthetic.default_scene(0)

    # pre-render a few distinct frames (host-side, not timed)
    n_frames = 4
    frames = []
    for i in range(n_frames):
        T = np.eye(4)
        T[:3, 3] = [0.0, 0.0, 0.12 * i]
        left, _ = synthetic.render(scene, K, w, h, T)
        right, _ = synthetic.render(scene, K, w, h, synthetic.stereo_pose(T, b))
        frames.append((jnp.asarray(left), jnp.asarray(right)))

    Kj = jnp.asarray(K, dtype=jnp.float32)
    bj = jnp.float32(b)

    @jax.jit
    def frame_step(left, right):
        dIpL, asgL = build_pyramid(left, n_levels)
        dIpR, _ = build_pyramid(right, n_levels)
        ths = block_thresholds(asgL[0], settings)
        sel = select(dIpL[0], asgL[0], asgL[1], asgL[2], ths, 5, 1.0, 0, settings)
        us, vs, types, valid = map_to_points(sel.status_map, settings.immature_cap)
        return stereo_match_points(
            us, vs, valid, dIpL[0], dIpR[0], Kj, bj, settings=settings
        )

    # warmup / compile
    res = frame_step(*frames[0])
    jax.block_until_ready(res)

    iters = 30
    t0 = time.perf_counter()
    for i in range(iters):
        res = frame_step(*frames[i % n_frames])
    jax.block_until_ready(res)
    dt = (time.perf_counter() - t0) / iters

    fps = 1.0 / dt
    baseline_fps = 18.9  # reference KITTI 05 full pipeline (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": "stereo_match_fps_kitti_res",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / baseline_fps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
