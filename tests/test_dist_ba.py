import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereo_dso_g2o_tpu.backend import ba
from stereo_dso_g2o_tpu.parallel import dist_ba
from stereo_dso_g2o_tpu.config import default_settings

from test_ba import _build_window, SET


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_distributed_ba_matches_single_device():
    """Point-sharded BA over an 8-device mesh must match the single-device
    iteration to float32 reduction tolerance."""
    win, dI_stack, poses, idepths, K = _build_window(
        seed=6, n_pts=128, pose_noise=2e-3, idepth_noise=0.04
    )
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), (dist_ba.AXIS,))

    step = dist_ba.sharded_ba_step(mesh, win, SET)
    win_sh = dist_ba.shard_window(mesh, win)

    win_ref = win
    for it in range(3):
        win_sh, e_d, conv_d, nres_d = step(
            win_sh, dI_stack, jnp.asarray(it)
        )
        win_ref, e_r, conv_r, nres_r = ba.ba_iteration(
            win_ref, dI_stack, jnp.asarray(it), settings=SET
        )
        assert int(nres_d) == int(nres_r), (int(nres_d), int(nres_r))
        # float32 all-reduce order differs from the single-device sum; the
        # divergence compounds through the GN steps — iteration 0 is tight,
        # later iterations drift at the 1e-3 level
        np.testing.assert_allclose(
            float(e_d), float(e_r), rtol=1e-4 if it == 0 else 5e-3
        )

    np.testing.assert_allclose(
        np.asarray(win_sh.state), np.asarray(win_ref.state), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(win_sh.pt_idepth), np.asarray(win_ref.pt_idepth), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(win_sh.c_value), np.asarray(win_ref.c_value), rtol=1e-4
    )


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_distributed_ba_two_devices():
    win, dI_stack, poses, idepths, K = _build_window(seed=8, n_pts=64)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:2]), (dist_ba.AXIS,))
    step = dist_ba.sharded_ba_step(mesh, win, SET)
    win_sh = dist_ba.shard_window(mesh, win)
    win_sh, e, conv, nres = step(win_sh, dI_stack, jnp.asarray(0))
    assert np.isfinite(float(e))
    assert int(nres) > 0
