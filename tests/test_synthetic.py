import numpy as np

from stereo_dso_g2o_tpu.io import synthetic


def test_stereo_disparity_consistency():
    """Rendered stereo pair must satisfy right(u - fx*b*id, v) == left(u, v)."""
    scene = synthetic.default_scene(0)
    w, h = 128, 96
    K = synthetic.default_K(w, h)
    b = 0.3
    left, right, idepth = synthetic.render_stereo_pair(scene, K, w, h, b)
    fx = K[0, 0]
    errs = []
    for v in range(20, h - 20, 7):
        for u in range(20, w - 20, 7):
            disp = fx * b * idepth[v, u]
            ur = u - disp
            if ur < 1 or ur > w - 2:
                continue
            x0 = int(np.floor(ur))
            f = ur - x0
            val = right[v, x0] * (1 - f) + right[v, x0 + 1] * f
            errs.append(abs(val - left[v, u]))
    errs = np.array(errs)
    assert len(errs) > 50
    # interpolation & texture-sampling noise only
    assert np.median(errs) < 1.5, np.median(errs)


def test_idepth_positive_and_smooth():
    scene = synthetic.default_scene(1)
    w, h = 64, 64
    K = synthetic.default_K(w, h)
    _, idepth = synthetic.render(scene, K, w, h, np.eye(4))
    assert (idepth > 0).all()
    assert idepth.max() < 1.0  # plane ~5m away


def test_multi_scene_occlusion_structure():
    """The box scene must produce real depth discontinuities (occlusion
    boundaries) and satisfy the same stereo-disparity identity per pixel."""
    scene = synthetic.box_scene(seed=3, n_boxes=5)
    w, h = 192, 96
    K = synthetic.default_K(w, h, fov_deg=70.0)
    b = 0.4
    left, right, idepth = synthetic.render_multi_stereo_pair(scene, K, w, h, b)
    assert left.shape == (h, w)
    assert (idepth > 0).all()

    # depth discontinuities: neighbouring-pixel idepth jumps well above any
    # smooth-surface gradient
    jumps = np.abs(np.diff(idepth, axis=1))
    assert (jumps > 0.02).sum() > 30, "scene has no occlusion boundaries"

    # photometric consistency away from occlusion edges
    fx = K[0, 0]
    errs = []
    edge = (jumps > 1e-3)
    for v in range(8, h - 8, 5):
        for u in range(8, w - 8, 5):
            if edge[v, max(u - 3, 0) : u + 3].any():
                continue
            disp = fx * b * idepth[v, u]
            ur = u - disp
            if ur < 1 or ur > w - 2:
                continue
            x0 = int(np.floor(ur))
            f = ur - x0
            val = right[v, x0] * (1 - f) + right[v, x0 + 1] * f
            errs.append(abs(val - left[v, u]))
    errs = np.array(errs)
    assert len(errs) > 50
    assert np.median(errs) < 1.5, np.median(errs)


def test_multi_scene_exposure_variation():
    scene = synthetic.box_scene(seed=4, n_boxes=3)
    w, h = 96, 64
    K = synthetic.default_K(w, h)
    l1, _, _ = synthetic.render_multi_stereo_pair(scene, K, w, h, 0.3, exposure=1.0)
    l2, _, _ = synthetic.render_multi_stereo_pair(scene, K, w, h, 0.3, exposure=0.7)
    ratio = l2[l1 > 10] / l1[l1 > 10]
    assert abs(np.median(ratio) - 0.7) < 0.02


def test_forward_trajectory_shape():
    poses = synthetic.forward_trajectory(50, step=0.3)
    assert len(poses) == 50
    # camera advances ~0.3 m/frame in world space
    c0 = -poses[0][:3, :3].T @ poses[0][:3, 3]
    c1 = -poses[-1][:3, :3].T @ poses[-1][:3, 3]
    d = np.linalg.norm(c1 - c0)
    assert 10.0 < d < 16.0, d


def test_moved_camera_renders():
    scene = synthetic.default_scene(2)
    w, h = 64, 64
    K = synthetic.default_K(w, h)
    T = np.eye(4)
    T[:3, 3] = [0.05, -0.02, 0.1]
    img, idepth = synthetic.render(scene, K, w, h, T)
    assert img.shape == (h, w)
    assert np.isfinite(img).all()
    assert (idepth > 0).mean() > 0.99


def test_fast_renderer_matches_numpy():
    """The JAX raycaster (bench path) must reproduce the numpy reference
    renderer: same nearest-hit geometry, tiling, bilinear filter, exposure.

    Away from occlusion boundaries the deviation is float32-vs-float64
    intersection roundoff only (<0.002 gray levels measured at 256x128).
    AT a boundary, roundoff can flip the nearest-hit winner for a subpixel
    sample, so a sparse set of edge pixels may differ by whole gray levels —
    the checks are therefore distributional, not max-abs."""
    w, h, base = 96, 64, 0.2
    K = synthetic.default_K(w, h, fov_deg=80.0)
    scene = synthetic.corridor_scene(seed=7, length=12.0, box_spacing=4.0,
                                     lateral=5.0)
    poses = synthetic.forward_trajectory(3, step=0.15, yaw_amp=0.1,
                                         yaw_period=10.0, seed=2)
    expos = np.array([1.0, 0.9, 1.1])
    lefts, rights = synthetic.render_stereo_sequence_fast(
        scene, K, w, h, base, poses, expos, chunk=2
    )
    assert lefts.shape == (3, h, w) and lefts.dtype == np.uint8
    for f in [0, 2]:
        l_np, r_np, idep_np = synthetic.render_multi_stereo_pair(
            scene, K, w, h, base, poses[f], exposure=expos[f]
        )
        for fast, ref in [(lefts[f], l_np), (rights[f], r_np)]:
            d = np.abs(fast.astype(np.float64)
                       - np.clip(ref, 0, 255).astype(np.uint8))
            assert (d > 1).mean() < 0.005, (d > 1).mean()
            assert (d > 0).mean() < 0.03, (d > 0).mean()
        _, idep_fast = synthetic.render_multi_fast(scene, K, w, h, poses[f])
        di = np.abs(idep_fast - idep_np)
        assert (di > 1e-5).mean() < 0.005, (di > 1e-5).mean()
        assert np.median(di) < 1e-6
