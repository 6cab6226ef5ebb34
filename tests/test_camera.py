"""Golden tests for camera math against constants pinned in the reference
(preprocessing/create_img_h5.py, cam_est/model_cam.py, demo/demo.py)."""
import numpy as np
import jax.numpy as jnp

from disn_tpu.core import camera


def test_blender_intrinsics_constants():
    K, RT = camera.blender_proj(az=30.0, el=20.0, distance_ratio=0.7)
    # f_pix = 35 * 137 / 32 = 149.84375, c = 68.5 (cam_est/model_cam.py:28)
    assert np.isclose(K[0, 0], 149.84375)
    assert np.isclose(K[1, 1], 149.84375)
    assert np.isclose(K[0, 2], 68.5)
    assert np.isclose(K[1, 2], 68.5)
    assert K.shape == (3, 3) and RT.shape == (3, 4)


def test_extrinsics_orthonormal():
    for az, el, d in [(0, 0, 1.0), (33.0, 12.0, 0.9), (290.0, -5.0, 0.65)]:
        _, RT = camera.blender_proj(az, el, d)
        R = RT[:, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        # camera sits at distance d * 1.75 from origin
        t = RT[:, 3]
        np.testing.assert_allclose(np.linalg.norm(R.T @ t), d * 1.75, rtol=1e-6)


def test_rotate_matrix_is_fixed_permutation():
    # At angle -pi/2: neg @ rz(-pi/2)^2 = diag(1,1,-1); sy = diag(1,-1,1);
    # rx(-pi/2) maps (x,y,z)->(x,z,-y). Net: diag(1,-1,-1)@(x,z,-y)
    # = (x,-z,y) — the y/z swap-with-flip between ShapeNet model frame and
    # the renderer's world frame.
    R = camera.rotate_matrix(-np.pi / 2)
    v = np.array([1.0, 2.0, 3.0, 1.0])
    out = R @ v
    np.testing.assert_allclose(out[:3], [1.0, -3.0, 2.0], atol=1e-12)
    np.testing.assert_allclose(R[3], [0, 0, 0, 1], atol=0)


def test_norm_matrix_denormalizes():
    centroid = np.array([0.1, -0.2, 0.3])
    m = 2.5
    N = camera.norm_matrix(centroid, m)
    p_norm = np.array([0.4, 0.5, -0.6, 1.0])
    out = N @ p_norm
    np.testing.assert_allclose(out[:3], p_norm[:3] * m + centroid, rtol=1e-12)


def test_project_points_matches_numpy_pipeline():
    rng = np.random.default_rng(0)
    centroid = rng.normal(size=3) * 0.1
    m = 1.7
    trans, regress, K, RT = camera.view_params_to_trans_mat(
        az=48.0, el=25.0, distance_ratio=0.8, centroid=centroid, m=m)
    assert trans.shape == (4, 3) and regress.shape == (4, 3)
    # numpy oracle: exactly the reference's get_img_points math
    pts = rng.normal(size=(5, 3)).astype(np.float32) * 0.4
    homo = np.concatenate([pts, np.ones((5, 1), np.float32)], axis=1)
    xyz = homo @ trans
    xy = xyz[:, :2] / xyz[:, 2:3]
    xy = np.minimum(136.0, np.maximum(0.0, xy))

    out = camera.project_points(jnp.asarray(pts)[None], jnp.asarray(trans)[None])
    np.testing.assert_allclose(np.asarray(out[0]), xy, rtol=1e-5, atol=1e-4)


def test_trans_mat_consistency_with_K_regress():
    # trans_mat == regress_mat @ K^T (checked in reference get_img,
    # preprocessing/create_img_h5.py:290-291)
    trans, regress, K, RT = camera.view_params_to_trans_mat(
        az=123.0, el=-10.0, distance_ratio=1.0,
        centroid=np.zeros(3), m=1.0)
    np.testing.assert_allclose(trans, regress @ K.T, rtol=1e-5, atol=1e-5)


def test_object_center_projects_to_image_center():
    # The normalized object sits at the origin; every view looks at it, so the
    # origin must project to the principal point (68.5, 68.5) with positive
    # depth. (The lens half-angle is only atan(68.5/149.84) ~ 24.6 deg, so
    # sphere-edge points CAN leave the image — that's why the reference
    # clamps, model_normalization.py:249-251.)
    for az, el, d in [(0, 10, 0.75), (120, 25, 0.9), (300, 5, 1.0)]:
        trans, _, _, _ = camera.view_params_to_trans_mat(
            az, el, d, centroid=np.zeros(3), m=1.0)
        xyz = np.array([0.0, 0, 0, 1.0]) @ trans
        assert xyz[2] > 0
        np.testing.assert_allclose(xyz[:2] / xyz[2], [68.5, 68.5], atol=1e-4)
        # depth equals camera distance
        np.testing.assert_allclose(xyz[2], d * 1.75, rtol=1e-6)


def test_ortho6d_rotation():
    rng = np.random.default_rng(2)
    poses = jnp.asarray(rng.normal(size=(4, 6)).astype(np.float32))
    R = np.asarray(camera.ortho6d_to_rotation(poses))
    for i in range(4):
        np.testing.assert_allclose(R[i].T @ R[i], np.eye(3), atol=1e-5)
        assert np.linalg.det(R[i]) > 0.99


def test_geodesic_distance_zero_for_same():
    rng = np.random.default_rng(3)
    poses = jnp.asarray(rng.normal(size=(2, 6)).astype(np.float32))
    R = camera.ortho6d_to_rotation(poses)
    d = np.asarray(camera.geodesic_distance(R, R))
    np.testing.assert_allclose(d, 0.0, atol=1e-3)
