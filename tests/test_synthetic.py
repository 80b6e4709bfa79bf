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
