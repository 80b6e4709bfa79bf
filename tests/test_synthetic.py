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
