import jax.numpy as jnp
import numpy as np

from stereo_dso_g2o_tpu.config import default_settings
from stereo_dso_g2o_tpu.io import synthetic
from stereo_dso_g2o_tpu.ops.pyramid import build_pyramid
from stereo_dso_g2o_tpu.ops.selector import (
    PixelSelector,
    block_thresholds,
    map_to_points,
    select,
)

SET = default_settings()


def _frame(seed=0, w=256, h=128):
    scene = synthetic.default_scene(seed)
    K = synthetic.default_K(w, h)
    img, _ = synthetic.render(scene, K, w, h, np.eye(4))
    return build_pyramid(jnp.asarray(img), 4)


def test_block_thresholds_shape_and_range():
    dIp, asg = _frame()
    ths = block_thresholds(asg[0], SET)
    assert ths.shape == (128 // 32, 256 // 32)
    t = np.asarray(ths)
    # squared thresholds: at least minGradHistAdd^2, at most (90+7)^2
    assert (t >= SET.min_grad_hist_add**2 - 1e-3).all()
    assert (t <= 97.0**2).all()


def test_select_spatial_distribution():
    dIp, asg = _frame()
    ths = block_thresholds(asg[0], SET)
    sel = select(dIp[0], asg[0], asg[1], asg[2], ths, pot=4, settings=SET)
    m = np.asarray(sel.status_map)
    assert set(np.unique(m)).issubset({0, 1, 2, 4})
    n = (m > 0).sum()
    assert n > 100, n
    # at most one selected pixel per pot cell at level 0
    pot = 4
    for by in range(0, 128, pot):
        for bx in range(0, 256, pot):
            assert (m[by : by + pot, bx : bx + pot] == 1).sum() <= 1


def test_selected_pixels_have_high_gradient():
    dIp, asg = _frame()
    ths = block_thresholds(asg[0], SET)
    sel = select(dIp[0], asg[0], asg[1], asg[2], ths, pot=4, settings=SET)
    m = np.asarray(sel.status_map)
    g = np.asarray(asg[0])
    lvl0 = m == 1
    assert lvl0.sum() > 50
    med_sel = np.median(g[lvl0])
    med_all = np.median(g[4:-5, 4:-5])
    assert med_sel > 2 * med_all, (med_sel, med_all)


def test_density_control():
    dIp, asg = _frame()
    selector = PixelSelector(SET)
    for want in (300.0, 800.0):
        status, n = selector.make_maps(dIp[0], asg[0], asg[1], asg[2], want)
        assert 0.25 * want <= n <= 1.6 * want, (want, n)


def test_map_to_points_roundtrip():
    dIp, asg = _frame()
    selector = PixelSelector(SET)
    status, n = selector.make_maps(dIp[0], asg[0], asg[1], asg[2], 400.0)
    us, vs, types, valid = map_to_points(status, 1024)
    assert int(valid.sum()) == n
    m = np.asarray(status)
    for u, v, t, ok in list(zip(np.asarray(us), np.asarray(vs), np.asarray(types), np.asarray(valid)))[:50]:
        if ok:
            assert m[int(v), int(u)] == t
