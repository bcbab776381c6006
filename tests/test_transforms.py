import jax.numpy as jnp
import numpy as np
import pytest

from mamri_tpu.core import transforms as T


def test_rot_z_basic():
    m = T.rot_z(jnp.pi / 2)
    pt = T.apply(m, jnp.array([[1.0, 0.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(pt[0]), [0.0, 1.0, 0.0], atol=1e-6)


def test_rot_y_basic():
    m = T.rot_y(jnp.pi / 2)
    pt = T.apply(m, jnp.array([[1.0, 0.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(pt[0]), [0.0, 0.0, -1.0], atol=1e-6)


def test_rot_x_basic():
    m = T.rot_x(jnp.pi / 2)
    pt = T.apply(m, jnp.array([[0.0, 1.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(pt[0]), [0.0, 0.0, 1.0], atol=1e-6)


def test_translate_compose():
    m = T.translate(jnp.array([1.0, 2.0, 3.0])) @ T.rot_z(jnp.pi)
    pt = T.apply(m, jnp.array([[1.0, 0.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(pt[0]), [0.0, 2.0, 3.0], atol=1e-5)


@pytest.mark.parametrize("axis_code,theta", [(T.AXIS_IS, 0.7), (T.AXIS_PA, -0.4), (T.AXIS_LR, 1.1)])
def test_articulation_roundtrip(axis_code, theta):
    m = T.articulation_matrix(axis_code, jnp.float32(theta))
    rec = T.angle_about_axis(m, axis_code)
    assert abs(float(rec) - theta) < 1e-6


def test_axis_conventions_match_reference():
    """IS -> RotZ(+t), PA -> RotY(-t), LR -> RotX(+t) (Mamri.py:1760-1769)."""
    t = 0.3
    np.testing.assert_allclose(
        np.asarray(T.articulation_matrix(T.AXIS_IS, jnp.float32(t))), np.asarray(T.rot_z(jnp.float32(t))), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(T.articulation_matrix(T.AXIS_PA, jnp.float32(t))), np.asarray(T.rot_y(jnp.float32(-t))), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(T.articulation_matrix(T.AXIS_LR, jnp.float32(t))), np.asarray(T.rot_x(jnp.float32(t))), atol=1e-7
    )


def test_batched_rotations():
    thetas = jnp.linspace(-3.0, 3.0, 7)
    ms = T.rot_z(thetas)
    assert ms.shape == (7, 4, 4)
    # each slice orthonormal
    rtr = np.einsum("bij,bik->bjk", np.asarray(ms[:, :3, :3]), np.asarray(ms[:, :3, :3]))
    np.testing.assert_allclose(rtr, np.tile(np.eye(3), (7, 1, 1)), atol=1e-6)
