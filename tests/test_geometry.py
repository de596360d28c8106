import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navtech_radar_slam_tpu.utils import geometry as geo


def random_se3(rng, n=()):
    w = rng.normal(size=n + (3,)) * 1.5
    t = rng.normal(size=n + (3,)) * 10.0
    R = np.asarray(geo.so3_exp(jnp.asarray(w, jnp.float32)))
    return np.asarray(geo.se3_from_rt(jnp.asarray(R), jnp.asarray(t, jnp.float32)))


def test_se2_compose_inverse(rng):
    a = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
    ab = geo.se2_mul(a, b)
    rec_b = geo.se2_mul(geo.se2_inv(a), ab)
    np.testing.assert_allclose(rec_b[:, :2], b[:, :2], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(geo.wrap_angle(rec_b[:, 2] - b[:, 2])), 0.0, atol=1e-4
    )


def test_se2_between_roundtrip(rng):
    a = jnp.asarray(rng.normal(size=(3,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(3,)), jnp.float32)
    rel = geo.se2_between(a, b)
    np.testing.assert_allclose(geo.se2_mul(a, rel), geo.se2_mul(b, geo.se2_identity()), atol=1e-4)


def test_se2_apply_matches_se3(rng):
    p = jnp.asarray([1.0, -2.0, 0.7], jnp.float32)
    pts2 = jnp.asarray(rng.normal(size=(10, 2)), jnp.float32)
    pts3 = jnp.concatenate([pts2, jnp.zeros((10, 1))], axis=-1)
    out2 = geo.se2_apply(p, pts2)
    out3 = geo.se3_apply(geo.se2_to_se3(p), pts3)
    np.testing.assert_allclose(out2, out3[:, :2], atol=1e-5)


def test_so3_exp_log_roundtrip(rng):
    w = jnp.asarray(rng.normal(size=(20, 3)), jnp.float32)
    w = w / jnp.linalg.norm(w, axis=-1, keepdims=True) * jnp.asarray(
        rng.uniform(0.001, 3.0, size=(20, 1)), jnp.float32
    )
    R = geo.so3_exp(w)
    w2 = geo.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=2e-3)


def test_so3_log_small_angle():
    w = jnp.asarray([[1e-6, -2e-6, 3e-7], [0.0, 0.0, 0.0]], jnp.float32)
    R = geo.so3_exp(w)
    w2 = geo.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-6)


def test_se3_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.normal(size=(20, 6)), jnp.float32)
    T = geo.se3_exp(xi)
    xi2 = geo.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=2e-3)


def test_se3_inverse_between(rng):
    A = jnp.asarray(random_se3(rng, (4,)))
    B = jnp.asarray(random_se3(rng, (4,)))
    rel = geo.se3_between(A, B)
    np.testing.assert_allclose(np.asarray(A @ rel), np.asarray(B), atol=1e-3)
    I = geo.se3_mul(A, geo.se3_inv(A))
    np.testing.assert_allclose(np.asarray(I), np.broadcast_to(np.eye(4), (4, 4, 4)), atol=1e-4)


def test_pose6d_roundtrip(rng):
    p = jnp.asarray(
        np.concatenate(
            [rng.normal(size=(8, 3)) * 5,
             rng.uniform(-1.2, 1.2, size=(8, 3))], axis=-1
        ),
        jnp.float32,
    )
    T = geo.pose6d_to_se3(p)
    p2 = geo.se3_to_pose6d(T)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p), atol=1e-4)


def test_se2_se3_roundtrip(rng):
    p = jnp.asarray(rng.normal(size=(6, 3)), jnp.float32)
    T = geo.se2_to_se3(p)
    p2 = geo.se3_to_se2(T)
    np.testing.assert_allclose(np.asarray(p2[:, :2]), np.asarray(p[:, :2]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(geo.wrap_angle(p2[:, 2] - p[:, 2])), 0.0, atol=1e-5
    )


def test_geometry_jit_vmap(rng):
    xi = jnp.asarray(rng.normal(size=(8, 6)), jnp.float32)
    f = jax.jit(jax.vmap(lambda x: geo.se3_log(geo.se3_exp(x))))
    np.testing.assert_allclose(np.asarray(f(xi)), np.asarray(xi), atol=2e-3)


def test_config_roundtrip():
    from navtech_radar_slam_tpu.config import SlamConfig

    c = SlamConfig()
    c2 = SlamConfig.from_json(c.to_json())
    assert c == c2
    assert c.scancontext.num_ring == 20
    assert c.scancontext.sc_dist_thres == pytest.approx(0.45)
    assert c.keyframes.keyframe_meter_gap == pytest.approx(0.2)
    assert c.radar.padded_range_bins % 128 == 0
