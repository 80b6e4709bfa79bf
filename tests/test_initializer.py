import jax.numpy as jnp
import numpy as np

from stereo_dso_g2o_tpu.config import Settings
from stereo_dso_g2o_tpu.frontend.initializer import MonoInitializer
from stereo_dso_g2o_tpu.io import synthetic
from stereo_dso_g2o_tpu.models.camera import make_calib
from stereo_dso_g2o_tpu.ops.pyramid import build_pyramid
from stereo_dso_g2o_tpu.utils import knn, se3

SET = Settings(desired_point_density=600.0, immature_cap=512, active_cap=1024)


def test_grid_knn_matches_bruteforce():
    # jittered grid — the realistic distribution of selector output
    # (one point per potential cell)
    rng = np.random.default_rng(0)
    gy, gx = np.mgrid[0:10, 0:20]
    us_np = (gx.ravel() * 5.0 + rng.uniform(0, 4, 200)).astype(np.float32)
    vs_np = (gy.ravel() * 5.0 + rng.uniform(0, 4, 200)).astype(np.float32)
    n = 200
    us = jnp.asarray(us_np)
    vs = jnp.asarray(vs_np)
    valid = jnp.ones(n, bool)
    idx, d2 = knn.grid_knn(us, vs, valid, jnp.float32(5.0), gh=16, gw=24, k=5)
    # spot check a few points against brute force (grid KNN is approximate
    # but should agree on the single nearest neighbour almost always)
    U = np.asarray(us); V = np.asarray(vs)
    agree = 0
    for i in range(0, n, 10):
        d = (U - U[i]) ** 2 + (V - V[i]) ** 2
        d[i] = np.inf
        if np.asarray(idx)[i, 0] == int(np.argmin(d)):
            agree += 1
    assert agree >= 15, agree


def test_mono_initializer_snaps_and_recovers_structure():
    """Feed a mono sequence with growing baseline: the initializer must snap
    (enough parallax) and produce idepths correlated with ground truth up to
    the mono scale gauge."""
    scene = synthetic.default_scene(13)
    w, h = 192, 96
    K = synthetic.default_K(w, h)
    calib = make_calib(K[0, 0], K[1, 1], K[0, 2], K[1, 2], 0.1, w, h, n_levels=4)

    img0, idepth0 = synthetic.render(scene, K, w, h, np.eye(4))
    dIp0, asg0 = build_pyramid(jnp.asarray(img0), 4)

    ini = MonoInitializer(calib, SET)
    ini.set_first(dIp0, asg0)

    done = False
    for i in range(1, 8):
        xi = np.array([0.06 * i, 0.015 * i, 0.02 * i, 0.0, 0.004 * i, 0.0])
        T = np.asarray(se3.se3_exp(jnp.asarray(xi)), dtype=np.float64)
        img, _ = synthetic.render(scene, K, w, h, T)
        dIp, _ = build_pyramid(jnp.asarray(img), 4)
        done = ini.track_frame(dIp)
    assert ini.snapped, "initializer never snapped despite large parallax"

    # level-0 idepths vs ground truth: correlation up to scale
    L = ini.levels[0]
    good = np.asarray(L.valid & L.is_good)
    us = np.asarray(L.u).astype(int)
    vs = np.asarray(L.v).astype(int)
    est = np.asarray(L.idepth)
    gt = idepth0[np.clip(vs, 0, h - 1), np.clip(us, 0, w - 1)]
    assert good.sum() > 50
    lam = np.median(gt[good] / est[good])
    rel = np.abs(est[good] * lam - gt[good]) / gt[good]
    assert np.median(rel) < 0.2, np.median(rel)

    # recovered translation direction roughly matches ground truth
    t_est = ini.this_to_next[:3, 3]
    t_gt = np.asarray(se3.se3_exp(jnp.asarray(
        np.array([0.06 * 7, 0.015 * 7, 0.02 * 7, 0.0, 0.004 * 7, 0.0])
    )))[:3, 3]
    cos = np.dot(t_est, t_gt) / (np.linalg.norm(t_est) * np.linalg.norm(t_gt) + 1e-12)
    assert cos > 0.9, (cos, t_est, t_gt)
