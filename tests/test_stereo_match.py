import jax.numpy as jnp
import numpy as np

from stereo_dso_g2o_tpu.config import default_settings
from stereo_dso_g2o_tpu.frontend.stereo_match import stereo_match
from stereo_dso_g2o_tpu.io import synthetic
from stereo_dso_g2o_tpu.models.camera import make_calib

SET = default_settings()


def test_stereo_match_end_to_end():
    """MODE_STEREOMATCH (BASELINE config 3): idepth map vs ground truth."""
    scene = synthetic.default_scene(11)
    w, h, b = 256, 128, 0.15
    K = synthetic.default_K(w, h)
    left, right, idepth_gt = synthetic.render_stereo_pair(scene, K, w, h, b)
    calib = make_calib(K[0, 0], K[1, 1], K[0, 2], K[1, 2], b, w, h, n_levels=4)

    result, imap = stereo_match(left, right, calib, settings=SET)
    good = np.asarray(result.good)
    assert good.sum() > 150, good.sum()

    us = np.asarray(result.us).astype(int)
    vs = np.asarray(result.vs).astype(int)
    est = np.asarray(result.idepth)
    gt = idepth_gt[vs, us]
    rel = np.abs(est[good] - gt[good]) / gt[good]
    assert np.median(rel) < 0.03, np.median(rel)
    # the L/R consistency gate should leave few gross outliers
    assert (rel > 0.2).mean() < 0.05, (rel > 0.2).mean()

    # idepth map mirrors the accepted points
    m = np.asarray(imap)
    assert (m[vs[good], us[good], 0] == est[good]).all()
    # interval brackets: min <= idepth <= max for accepted points (after the
    # reference's swap, ImmaturePoint.cpp:434-436)
    lo = np.asarray(result.idepth_min)[good]
    hi = np.asarray(result.idepth_max)[good]
    assert (lo <= hi).all()


def test_stereo_match_rejects_textureless():
    """A flat (textureless) scene yields (almost) no accepted matches."""
    w, h, b = 256, 128, 0.15
    K = synthetic.default_K(w, h)
    flat = np.full((h, w), 128.0, dtype=np.float32)
    calib = make_calib(K[0, 0], K[1, 1], K[0, 2], K[1, 2], b, w, h, n_levels=4)
    result, _ = stereo_match(flat, flat, calib, settings=SET)
    assert int(np.asarray(result.good).sum()) < 20
