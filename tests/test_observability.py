"""Viewer artifact + eigenvalue/Hessian diagnostics (VERDICT r1 items 8, 9)."""

import io
import json

import numpy as np
import pytest

from stereo_dso_g2o_tpu.config import Settings
from stereo_dso_g2o_tpu.frontend.full_system import FullSystem
from stereo_dso_g2o_tpu.io import synthetic
from stereo_dso_g2o_tpu.io.output_wrapper import JsonlOutputWrapper
from stereo_dso_g2o_tpu.models.camera import make_calib
from stereo_dso_g2o_tpu.utils import se3
import jax.numpy as jnp

W_, H_ = 256, 128
BASE = 0.12

SET = Settings(
    desired_point_density=600.0,
    desired_immature_density=450.0,
    immature_cap=512,
    active_cap=1024,
    log_eigenvalues=True,
)


@pytest.fixture(scope="module")
def run_system():
    scene = synthetic.default_scene(0)
    K = synthetic.default_K(W_, H_)
    calib = make_calib(K[0, 0], K[1, 1], K[0, 2], K[1, 2], BASE, W_, H_, n_levels=5)
    fs = FullSystem(calib, SET)
    fs.log_stream = io.StringIO()
    gt = []
    for i in range(8):
        xi = np.array(
            [0.025 * i, -0.008 * i, 0.04 * i, 0.002 * i, 0.004 * i, -0.001 * i]
        )
        T = np.asarray(se3.se3_exp(jnp.asarray(xi)), dtype=np.float64)
        gt.append(np.linalg.inv(T))
        left, right, _ = synthetic.render_stereo_pair(scene, K, W_, H_, BASE, T)
        fs.add_frame(left, right, i, timestamp=0.1 * i)
    return fs, gt


def test_point_cloud_world_positions(run_system):
    fs, _ = run_system
    pc = fs.point_cloud()
    assert pc["xyz"].shape[1] == 3
    assert len(pc["xyz"]) > 50
    # plane is ~5 m from the start pose along +z; world depth stays in range
    z = pc["xyz"][:, 2]
    assert np.percentile(z, 5) > 1.0 and np.percentile(z, 95) < 12.0, (
        z.min(), z.max()
    )
    assert (pc["host_kf_id"] >= 0).all()


def test_eigenvalue_log_stream(run_system):
    fs, _ = run_system
    recs = [json.loads(l) for l in fs.log_stream.getvalue().splitlines()]
    eigs = [r for r in recs if r["type"] == "eig"]
    assert len(eigs) >= 2  # one per keyframe
    e = eigs[-1]
    ev = np.asarray(e["ev_H"])
    D = 4 + 8 * fs.win.F
    assert ev.shape == (D,)
    assert ev[0] >= ev[-1]  # sorted descending
    assert ev[0] > 0
    assert len(e["H_diag"]) == D
    assert len(e["nullspace_response"]) == 7
    # gauge directions respond far weaker than the strongest eigendirection
    assert max(e["nullspace_response"]) < 0.05 * ev[0]


def test_viewer_render_run(run_system, tmp_path):
    fs, gt = run_system
    from stereo_dso_g2o_tpu.io.viewer import CloudAccumulator, render_run

    acc = CloudAccumulator()
    acc.update_from(fs)
    xyz, idp = acc.cloud()
    out = tmp_path / "run.png"
    render_run(str(out), fs.trajectory(), xyz, idp, gt_trajectory=gt)
    assert out.exists() and out.stat().st_size > 10_000


def test_viewer_render_feed(run_system, tmp_path):
    fs, _ = run_system
    buf = io.StringIO()
    w = JsonlOutputWrapper(buf)
    for sh in fs.history:
        w.publish_cam_pose(sh.id, fs._shell_T_cw(sh), sh.timestamp)
    w.publish_keyframes(
        [(k, sh.T_cw) for k, sh in enumerate(fs.kf_shells) if sh.T_cw is not None],
        fs.point_cloud(),
    )
    feed = tmp_path / "feed.jsonl"
    feed.write_text(buf.getvalue())
    from stereo_dso_g2o_tpu.io.viewer import render_feed

    out = tmp_path / "feed.png"
    render_feed(str(feed), str(out))
    assert out.exists() and out.stat().st_size > 10_000
