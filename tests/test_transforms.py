import jax.numpy as jnp
import numpy as np
import pytest

from sags_tpu.core import transforms as tf


def random_quats(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_rotmat_roundtrip(rng):
    q = random_quats(rng, 64)
    R = tf.quat_to_rotmat(jnp.asarray(q))
    q2 = np.asarray(tf.rotmat_to_quat(R))
    # q and -q are the same rotation
    sign = np.sign(np.sum(q * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(q, q2 * sign, atol=1e-5)


def test_quat_to_rotmat_is_rotation(rng):
    q = random_quats(rng, 16)
    R = np.asarray(tf.quat_to_rotmat(jnp.asarray(q)))
    np.testing.assert_allclose(
        R @ R.transpose(0, 2, 1), np.tile(np.eye(3), (len(R), 1, 1)), atol=1e-5
    )
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_quat_to_rotmat_matches_reference_formula(rng):
    """Check against a direct transliteration of forward.cu:141-145 (xyzw)."""
    q = random_quats(rng, 8)
    x, y, z, w = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R_ref = np.stack(
        [
            np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            np.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )
    R = np.asarray(tf.quat_to_rotmat(jnp.asarray(q)))
    np.testing.assert_allclose(R, R_ref, atol=1e-6)


def test_so3_exp_log_roundtrip(rng):
    w = rng.normal(size=(32, 3)).astype(np.float32) * 0.5
    R = tf.so3_exp(jnp.asarray(w))
    w2 = np.asarray(tf.so3_log(R))
    np.testing.assert_allclose(w, w2, atol=1e-4)


def test_so3_exp_small_angle():
    w = jnp.array([[1e-10, 0.0, 0.0], [0.0, 0.0, 0.0]])
    R = np.asarray(tf.so3_exp(w))
    np.testing.assert_allclose(R, np.eye(3)[None].repeat(2, 0), atol=1e-6)


def test_so3_exp_matches_rodrigues(rng):
    w = rng.normal(size=(8, 3)).astype(np.float64)
    theta = np.linalg.norm(w, axis=-1, keepdims=True)
    k = w / theta
    K = np.zeros((8, 3, 3))
    K[:, 0, 1], K[:, 0, 2] = -k[:, 2], k[:, 1]
    K[:, 1, 0], K[:, 1, 2] = k[:, 2], -k[:, 0]
    K[:, 2, 0], K[:, 2, 1] = -k[:, 1], k[:, 0]
    st = np.sin(theta)[..., None]
    ct = np.cos(theta)[..., None]
    R_ref = np.eye(3)[None] + st * K + (1 - ct) * (K @ K)
    R = np.asarray(tf.so3_exp(jnp.asarray(w, dtype=jnp.float32)))
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_se3_inverse(rng):
    w = rng.normal(size=3).astype(np.float32)
    t = rng.normal(size=3).astype(np.float32)
    T = tf.se3_matrix(tf.so3_exp(jnp.asarray(w)), jnp.asarray(t))
    TI = tf.se3_inverse(T)
    np.testing.assert_allclose(np.asarray(T @ TI), np.eye(4), atol=1e-5)


def test_quat_multiply_consistent_with_rotmat(rng):
    qa, qb = random_quats(rng, 4), random_quats(rng, 4)
    Rab = np.asarray(
        tf.quat_to_rotmat(tf.quat_multiply(jnp.asarray(qa), jnp.asarray(qb)))
    )
    Ra = np.asarray(tf.quat_to_rotmat(jnp.asarray(qa)))
    Rb = np.asarray(tf.quat_to_rotmat(jnp.asarray(qb)))
    np.testing.assert_allclose(Rab, Ra @ Rb, atol=1e-5)


def test_quat_scale_to_cov(rng):
    q = random_quats(rng, 8)
    s = rng.uniform(0.1, 2.0, size=(8, 3)).astype(np.float32)
    cov = np.asarray(tf.quat_scale_to_cov(jnp.asarray(s), jnp.asarray(q)))
    R = np.asarray(tf.quat_to_rotmat(jnp.asarray(q)))
    ref = R @ (s[..., None] ** 2 * np.eye(3)[None]) @ R.transpose(0, 2, 1)
    np.testing.assert_allclose(cov, ref, atol=1e-5)
    # eigenvalues == squared scales
    ev = np.sort(np.linalg.eigvalsh(cov), axis=-1)
    np.testing.assert_allclose(ev, np.sort(s**2, axis=-1), rtol=1e-4, atol=1e-5)
