import jax.numpy as jnp
import numpy as np

from mamri_tpu.core.robot import load_robot_model
from mamri_tpu.core.units import angles_to_steps, steps_to_angles


def test_angles_to_steps_truncates_toward_zero():
    """Parity with the reference's int() conversion (Mamri.py:1621-1629)."""
    spr = jnp.full((6,), 3332.0)
    angles = jnp.array([0.1, -0.1, 1.0, -1.0, 0.0, 3.14])
    steps = np.asarray(angles_to_steps(angles, spr))
    expected = [int(a * 3332.0 / (2 * np.pi)) for a in np.asarray(angles)]
    np.testing.assert_array_equal(steps, expected)
    # explicit truncation check: 0.1 rad * 530.3 steps/rad = 53.03 -> 53; -53.03 -> -53
    assert steps[0] == 53 and steps[1] == -53


def test_roundtrip_error_below_one_step():
    model = load_robot_model()
    angles = jnp.array([0.5, -1.2, 0.9, 2.2, -0.3, 1.7])
    steps = angles_to_steps(angles, model.steps_per_rev)
    back = steps_to_angles(steps, model.steps_per_rev)
    step_rad = 2 * np.pi / 3332.0
    assert np.all(np.abs(np.asarray(back - angles)) <= step_rad + 1e-6)


def test_zero_maps_to_zero():
    spr = jnp.full((6,), 3332.0)
    np.testing.assert_array_equal(np.asarray(angles_to_steps(jnp.zeros(6), spr)), np.zeros(6, dtype=np.int32))
    np.testing.assert_allclose(np.asarray(steps_to_angles(jnp.zeros(6, dtype=jnp.int32), spr)), np.zeros(6), atol=0)
