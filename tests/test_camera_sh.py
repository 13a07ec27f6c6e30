import math

import jax.numpy as jnp
import numpy as np

from sags_tpu.core import camera as cam
from sags_tpu.core import sh as shlib
from sags_tpu.core import transforms as tf


def test_fov_focal_roundtrip():
    fov = 1.2
    f = cam.fov2focal(fov, 640)
    assert abs(cam.focal2fov(f, 640) - fov) < 1e-9


def test_world_to_view_traditional(rng):
    q = rng.normal(size=4).astype(np.float32)
    q /= np.linalg.norm(q)
    R = np.asarray(tf.quat_to_rotmat(jnp.asarray(q)))
    t = rng.normal(size=3).astype(np.float32)
    V = np.asarray(cam.world_to_view(jnp.asarray(R), jnp.asarray(t)))
    # V = [R^T, -R^T t] — shared_objs.py:21-43
    np.testing.assert_allclose(V[:3, :3], R.T, atol=1e-6)
    np.testing.assert_allclose(V[:3, 3], -R.T @ t, atol=1e-5)
    # camera center maps to origin
    p = V @ np.array([*t, 1.0], np.float32)
    np.testing.assert_allclose(p[:3], 0.0, atol=1e-5)


def test_projection_matrix_matches_reference():
    """Direct transliteration of getProjectionMatrix (graphics_utils.py:52-73)."""
    znear, zfar, fovx, fovy = 0.01, 100.0, 1.0, 0.8
    tX, tY = math.tan(fovx / 2), math.tan(fovy / 2)
    top, right = tY * znear, tX * znear
    P_ref = np.zeros((4, 4), np.float32)
    P_ref[0, 0] = 2 * znear / (2 * right)
    P_ref[1, 1] = 2 * znear / (2 * top)
    P_ref[3, 2] = 1.0
    P_ref[2, 2] = zfar / (zfar - znear)
    P_ref[2, 3] = -(zfar * znear) / (zfar - znear)
    P = np.asarray(cam.projection_matrix(znear, zfar, fovx, fovy))
    np.testing.assert_allclose(P, P_ref, atol=1e-7)


def test_projection_ndc_to_pixel():
    """A point on the +x fov boundary at depth z lands on the image edge."""
    c = cam.make_camera(jnp.eye(3), jnp.zeros(3), 640, 480, 1.0, 0.8)
    z = 5.0
    p = jnp.array([z * c.tan_fovx, 0.0, z, 1.0])
    ph = np.asarray(c.full_proj @ p)
    ndc = ph[:3] / ph[3]
    assert abs(ndc[0] - 1.0) < 1e-5
    px = float(cam.ndc2pix(jnp.asarray(ndc[0]), 640))
    assert abs(px - (2 * 640 - 1) / 2) < 1e-3  # edge pixel center convention


def test_sh_deg0_constant(rng):
    sh = rng.normal(size=(5, 3, 1)).astype(np.float32)
    dirs = rng.normal(size=(5, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    out = np.asarray(shlib.eval_sh(0, jnp.asarray(sh), jnp.asarray(dirs)[:, None, :]))
    np.testing.assert_allclose(out, shlib.C0 * sh[..., 0], atol=1e-6)


def test_sh_rgb_roundtrip(rng):
    rgb = rng.uniform(size=(10, 3)).astype(np.float32)
    back = np.asarray(shlib.sh_to_rgb(shlib.rgb_to_sh(jnp.asarray(rgb))))
    np.testing.assert_allclose(back, rgb, atol=1e-6)


def test_sh_orthonormality_deg3(rng):
    """SH basis functions should be orthonormal over the sphere (MC check)."""
    n = 200_000
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    # Evaluate all 16 basis funcs by feeding unit coefficient vectors
    basis = []
    for i in range(16):
        sh = np.zeros((1, 1, 16), np.float32)
        sh[..., i] = 1.0
        val = np.asarray(
            shlib.eval_sh(3, jnp.asarray(sh), jnp.asarray(v[:, None, :], dtype=jnp.float32))
        ).reshape(-1)
        assert val.shape == (n,)
        basis.append(val)
    B = np.stack(basis, -1)  # [n, 16]
    gram = 4 * np.pi * (B.T @ B) / n
    np.testing.assert_allclose(gram, np.eye(16), atol=0.15)


def test_sh_to_color_clamps(rng):
    means = rng.normal(size=(20, 3)).astype(np.float32) + 5.0
    campos = jnp.zeros(3)
    sh = rng.normal(size=(20, 3, 1)).astype(np.float32) * 2.0
    rgb, clamped = shlib.sh_to_color(0, jnp.asarray(sh), jnp.asarray(means), campos)
    raw = shlib.C0 * sh[..., 0] + 0.5
    np.testing.assert_allclose(np.asarray(rgb), np.maximum(raw, 0.0), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(clamped), raw < 0)


def test_camera_to_json_roundtrip():
    """`camera_to_JSON` parity (`utils/camera_utils.py:66-88`): position is the
    camera center, rotation the cam->world matrix, focals from fovs."""
    import json

    from sags_tpu.core.camera import camera_to_json, fov2focal, make_camera

    th = 0.3
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0],
                  [0, 0, 1]], np.float32)
    t = np.array([1.0, 2.0, 3.0], np.float32)
    cam = make_camera(R, t, 640, 480, 1.0, 0.8)
    e = json.loads(json.dumps(camera_to_json(7, cam, "frame7")))
    assert e["id"] == 7 and e["img_name"] == "frame7"
    np.testing.assert_allclose(e["position"], t, atol=1e-6)
    np.testing.assert_allclose(e["rotation"], R, atol=1e-6)
    np.testing.assert_allclose(e["fx"], fov2focal(1.0, 640))
    np.testing.assert_allclose(e["fy"], fov2focal(0.8, 480))
