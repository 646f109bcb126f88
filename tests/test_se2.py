import numpy as np
import jax.numpy as jnp

from icp_tpu.utils import se2


def np_vec_to_pose(v):
    x, y, th = v
    c, s = np.cos(th), np.sin(th)
    return np.array([[c, -s, x], [s, c, y], [0, 0, 1]])


def test_wrap_angle():
    a = np.array([0.0, np.pi, -np.pi, 3 * np.pi, -3 * np.pi, 0.1, 6.38])
    got = np.asarray(se2.wrap_angle(jnp.asarray(a)))
    want = (a + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_pose_roundtrip():
    rng = np.random.default_rng(0)
    v = rng.uniform(-3, 3, size=(16, 3)).astype(np.float32)
    T = se2.vec_to_pose(jnp.asarray(v))
    back = np.asarray(se2.pose_to_vec(T))
    np.testing.assert_allclose(back[:, :2], v[:, :2], atol=1e-5)
    np.testing.assert_allclose(
        np.mod(back[:, 2] - v[:, 2] + np.pi, 2 * np.pi) - np.pi, 0, atol=1e-5
    )


def test_pose_inverse_compose():
    rng = np.random.default_rng(1)
    v = rng.uniform(-2, 2, size=(8, 3)).astype(np.float32)
    T = se2.vec_to_pose(jnp.asarray(v))
    I = np.asarray(se2.pose_compose(T, se2.pose_inverse(T)))
    np.testing.assert_allclose(I, np.broadcast_to(np.eye(3), I.shape), atol=1e-5)


def test_relative_pose_vec_matches_numpy():
    rng = np.random.default_rng(2)
    va = rng.uniform(-2, 2, 3)
    vb = rng.uniform(-2, 2, 3)
    Ta, Tb = np_vec_to_pose(va), np_vec_to_pose(vb)
    want_T = np.linalg.inv(Ta) @ Tb
    want = np.array(
        [want_T[0, 2], want_T[1, 2], np.arctan2(want_T[1, 0], want_T[0, 0])]
    )
    got = np.asarray(
        se2.relative_pose_vec(
            jnp.asarray(Ta, dtype=jnp.float32), jnp.asarray(Tb, dtype=jnp.float32)
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_apply_incremental_pose_matches_reference_semantics():
    # reference: slam.py:38-43 — global_pose @ [[r.T, -r.T t], [0, 1]]
    rng = np.random.default_rng(3)
    g = np_vec_to_pose(rng.uniform(-2, 2, 3))
    th = rng.uniform(-np.pi, np.pi)
    r = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    t = rng.uniform(-1, 1, 2)
    T_inv = np.eye(3)
    T_inv[:2, :2] = r.T
    T_inv[:2, 2] = -r.T @ t
    want = g @ T_inv
    got = np.asarray(
        se2.apply_incremental_pose(
            jnp.asarray(g, dtype=jnp.float32),
            jnp.asarray(r, dtype=jnp.float32),
            jnp.asarray(t, dtype=jnp.float32),
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_transform_points():
    rng = np.random.default_rng(4)
    pose = np_vec_to_pose([1.0, -2.0, 0.7])
    pts = rng.uniform(-5, 5, size=(32, 2))
    want = pts @ pose[:2, :2].T + pose[:2, 2]
    got = np.asarray(
        se2.transform_points(
            jnp.asarray(pts, dtype=jnp.float32), jnp.asarray(pose, dtype=jnp.float32)
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_quat_to_yaw():
    # yaw-only quaternion: q = (0, 0, sin(yaw/2), cos(yaw/2))
    for yaw in [-2.5, -0.3, 0.0, 1.2, 3.0]:
        got = float(
            se2.quat_to_yaw(0.0, 0.0, jnp.sin(yaw / 2), jnp.cos(yaw / 2))
        )
        assert abs(got - yaw) < 1e-5
