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


def test_host_twins_bit_equal():
    from mamri_tpu.core.units import angles_to_steps_host, steps_to_angles_host

    model = load_robot_model()
    rng = np.random.default_rng(3)
    angles = rng.uniform(-np.pi, np.pi, size=(64, model.num_joints)).astype(np.float32)
    dev = np.asarray(angles_to_steps(jnp.asarray(angles), model.steps_per_rev))
    host = angles_to_steps_host(angles, model.steps_per_rev)
    assert host.dtype == np.int32
    np.testing.assert_array_equal(dev, host)

    steps = rng.integers(-5000, 5000, size=(64, model.num_joints))
    dev_a = np.asarray(steps_to_angles(jnp.asarray(steps), model.steps_per_rev))
    host_a = steps_to_angles_host(steps, model.steps_per_rev)
    np.testing.assert_array_equal(dev_a, host_a)
