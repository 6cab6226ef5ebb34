"""Camera math: Blender-style projection, world->pixel matrix composition, and
the point->pixel projector.

The rendering protocol matches the reference ShapeNet renders: a 137x137 image
rendered by Blender with a 35mm lens on a 32mm sensor, camera on a sphere of
radius ``distance_ratio * 1.75`` (reference: preprocessing/create_img_h5.py:14-63).
The composed world->pixel transform is stored TRANSPOSED as a 4x3 matrix that
right-multiplies homogeneous points (create_img_h5.py:184-186), and the
projector divides by the third (depth) column and clamps to the image box
(models/model_normalization.py:241-251).

Host-side (numpy, float64 like the reference) and device-side (jnp) versions
live side by side; golden tests pin them against the constants cited above.
"""
from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

# Blender intrinsics of the ShapeNet renderer (create_img_h5.py:16-24).
F_MM = 35.0
SENSOR_SIZE_MM = 32.0
PIXEL_ASPECT_RATIO = 1.0
RESOLUTION_PCT = 100.0
SKEW = 0.0
CAM_MAX_DIST = 1.75

# Blender object->camera frame fix (create_img_h5.py:22-24).
CAM_ROT = np.array(
    [
        [1.910685676922942e-15, 4.371138828673793e-08, 1.0],
        [1.0, -4.371138828673793e-08, -0.0],
        [4.371138828673793e-08, 1.0, -4.371138828673793e-08],
    ]
)

# Fixed v1 intrinsics at 137x137: f_pix = 35*137/32 = 149.84375, c = 68.5
# (reference: cam_est/model_cam.py:28).
K_137 = np.array(
    [[149.84375, 0.0, 68.5], [0.0, 149.84375, 68.5], [0.0, 0.0, 1.0]],
    dtype=np.float32,
)

ROT90Y = np.array([[0, 0, -1], [0, 1, 0], [1, 0, 0]], dtype=np.float32)

# Translation-head bias of the camera net (models/posenet.py:77).
POSENET_T_BIAS = np.array([-0.00193892, 0.00169222, 1.3949631], dtype=np.float32)


def blender_proj(az: float, el: float, distance_ratio: float,
                 img_w: int = 137, img_h: int = 137) -> tuple[np.ndarray, np.ndarray]:
    """Intrinsics K (3x3) and extrinsics RT (3x4) from view metadata.

    Mirrors getBlenderProj (create_img_h5.py:14-63): azimuth/elevation in
    degrees, distance as a ratio of CAM_MAX_DIST.
    """
    scale = RESOLUTION_PCT / 100.0
    f_u = F_MM * img_w * scale / SENSOR_SIZE_MM
    f_v = F_MM * img_h * scale * PIXEL_ASPECT_RATIO / SENSOR_SIZE_MM
    u_0 = img_w * scale / 2
    v_0 = img_h * scale / 2
    K = np.array([[f_u, SKEW, u_0], [0, f_v, v_0], [0, 0, 1]], dtype=np.float64)

    sa, ca = np.sin(np.radians(-az)), np.cos(np.radians(-az))
    se, ce = np.sin(np.radians(-el)), np.cos(np.radians(-el))
    R_world2obj = np.array(
        [[ca * ce, -sa, ca * se], [sa * ce, ca, sa * se], [-se, 0, ce]]
    ).T
    R_obj2cam = CAM_ROT.T
    R_world2cam = R_obj2cam @ R_world2obj
    cam_location = np.array([[distance_ratio * CAM_MAX_DIST], [0.0], [0.0]])
    T_world2cam = -1 * R_obj2cam @ cam_location
    R_camfix = np.array([[1.0, 0, 0], [0, -1, 0], [0, 0, -1]])
    R_world2cam = R_camfix @ R_world2cam
    T_world2cam = R_camfix @ T_world2cam
    RT = np.hstack((R_world2cam, T_world2cam))
    return K, RT


def rotate_matrix(angle: float = -np.pi / 2) -> np.ndarray:
    """The fixed 4x4 model-frame rotation (create_img_h5.py:65-103):
    multi_dot([neg, rot_z, rot_z, scale_y_neg, rot_x]) at the given angle."""
    c, s = np.cos(angle), np.sin(angle)
    rx = np.array([[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]], dtype=np.float64)
    rz = np.array([[c, -s, 0, 0], [s, c, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], dtype=np.float64)
    sy = np.diag([1.0, -1.0, 1.0, 1.0])
    neg = np.diag([-1.0, -1.0, -1.0, 1.0])
    return neg @ rz @ rz @ sy @ rx


def norm_matrix(centroid: np.ndarray, m: float) -> np.ndarray:
    """Unit-sphere de-normalization matrix T_inv @ M_inv
    (create_img_h5.py:106-123): maps normalized model coords back to raw mesh
    coords (scale by m, translate by centroid)."""
    M_inv = np.diag([m, m, m, 1.0])
    T_inv = np.eye(4)
    T_inv[:3, 3] = np.asarray(centroid, dtype=np.float64)
    return T_inv @ M_inv


def compose_trans_mat(K: np.ndarray, RT: np.ndarray, rot_mat: np.ndarray,
                      norm_mat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(trans_mat, regress_mat), both transposed 4x3 right-multiply matrices
    (create_img_h5.py:184-186)."""
    trans = np.linalg.multi_dot([K, RT, rot_mat, norm_mat])
    regress = np.linalg.multi_dot([RT, rot_mat, norm_mat])
    return trans.T.astype(np.float32), regress.T.astype(np.float32)


def view_params_to_trans_mat(az: float, el: float, distance_ratio: float,
                             centroid: np.ndarray, m: float,
                             img_w: int = 137, img_h: int = 137
                             ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Full composition for one view: (trans_mat 4x3, regress_mat 4x3, K, RT)."""
    K, RT = blender_proj(az, el, distance_ratio, img_w=img_w, img_h=img_h)
    rot = rotate_matrix(-np.pi / 2)
    nm = norm_matrix(centroid, m)
    trans, regress = compose_trans_mat(K, RT, rot, nm)
    return trans, regress, K.astype(np.float32), RT.astype(np.float32)


def obj_rot_matrix(az_deg: float, el_deg: float, inl_deg: float) -> np.ndarray:
    """View-frame rotation applied to sample points when cfg.rot is set:
    rot90y @ camera_info(degree2rad(params)) (create_img_h5.py:178-179,204-258)."""
    az = np.deg2rad(az_deg + 180.0)
    el = np.deg2rad(el_deg)
    inl = np.deg2rad(inl_deg)

    caz, saz = np.cos(az), np.sin(az)
    cel, sel = np.cos(el), np.sin(el)
    cin, sin_ = np.cos(inl), np.sin(inl)
    az_mat = np.array([[caz, 0, saz], [0, 1, 0], [-saz, 0, caz]], dtype=np.float32)
    el_mat = np.array([[1, 0, 0], [0, cel, -sel], [0, sel, cel]], dtype=np.float32)
    inl_mat = np.array([[cin, -sin_, 0], [sin_, cin, 0], [0, 0, 1]], dtype=np.float32)
    cam_mat = (inl_mat @ el_mat @ az_mat).T
    return (ROT90Y @ cam_mat).astype(np.float32)


# --------------------------------------------------------------------------
# Device-side projector (hot path)
# --------------------------------------------------------------------------

def project_points(sample_pc: jnp.ndarray, trans_mat: jnp.ndarray,
                   img_w: int = 137, img_h: int = 137,
                   xyshift: jnp.ndarray | None = None,
                   clamp: bool = True) -> jnp.ndarray:
    """Project 3D query points into pixel coordinates.

    sample_pc: [..., N, 3]; trans_mat: [..., 4, 3] (right-multiply, transposed).
    Returns [..., N, 2] (x, y) pixel coords clamped to [0, img_w-1]x[0, img_h-1]
    (clamp=False returns the raw projection — the camera 2D loss uses it,
    cam_est/model_cam.py returns both and trains on the unclamped one).

    Mirrors get_img_points (model_normalization.py:241-251): homogeneous append,
    matmul, perspective divide by the z column, clamp. The optional xyshift adds
    the cam-net's predicted half-image-relative 2-DoF shift
    (cam_est/model_cam.py:119-120).
    """
    ones = jnp.ones(sample_pc.shape[:-1] + (1,), dtype=sample_pc.dtype)
    homo = jnp.concatenate([sample_pc, ones], axis=-1)
    # HIGHEST precision: the MXU's default f32 path rounds operands through
    # bfloat16, which costs ~0.3 px here and shifts every sampled feature.
    pc_xyz = jnp.matmul(homo, trans_mat, precision=jax.lax.Precision.HIGHEST)
    pc_xy = pc_xyz[..., :2] / pc_xyz[..., 2:3]
    if xyshift is not None:
        pc_xy = pc_xy + (xyshift[..., None, :] / 2.0 * img_h)
    if not clamp:
        return pc_xy
    lo = jnp.zeros((2,), dtype=pc_xy.dtype)
    hi = jnp.array([img_w - 1.0, img_h - 1.0], dtype=pc_xy.dtype)
    return jnp.clip(pc_xy, lo, hi)


def ortho6d_to_rotation(poses: jnp.ndarray) -> jnp.ndarray:
    """Gram-Schmidt 6D -> rotation matrix [B, 3, 3]
    (models/posenet.py:22-36): columns are (x, y, z)."""
    x_raw = poses[:, 0:3]
    y_raw = poses[:, 3:6]

    def _normalize(v):
        mag = jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True))
        return v / jnp.maximum(mag, 1e-8)

    x = _normalize(x_raw)
    z = _normalize(jnp.cross(x, y_raw))
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=2)  # [B,3,3] with x,y,z as columns


def geodesic_distance(m1: jnp.ndarray, m2: jnp.ndarray) -> jnp.ndarray:
    """Angle between rotation matrices [B,3,3] (posenet.py:38-47)."""
    m = m1 @ jnp.swapaxes(m2, -1, -2)
    cos = (m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2] - 1.0) / 2.0
    return jnp.arccos(jnp.clip(cos, -1.0, 1.0))
