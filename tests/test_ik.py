import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamri_tpu.core import transforms as T
from mamri_tpu.core.robot import fk_all_links, load_robot_model, marker_world_positions
from mamri_tpu.ik.lm import least_squares_lm
from mamri_tpu.ik.residuals import (
    full_chain_residual,
    solve_full_chain_ik,
    trajectory_pose_residual,
)


@pytest.fixture(scope="module")
def model():
    return load_robot_model()


def test_lm_solves_rosenbrock_style():
    def res(x):
        return jnp.array([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])

    out = least_squares_lm(res, jnp.array([-1.2, 1.0]), jnp.array([-5.0, -5.0]), jnp.array([5.0, 5.0]), num_iters=100)
    np.testing.assert_allclose(np.asarray(out.x), [1.0, 1.0], atol=1e-4)
    assert float(out.cost) < 1e-8


def test_lm_respects_bounds():
    def res(x):
        return x - 10.0  # unconstrained optimum at 10

    out = least_squares_lm(res, jnp.zeros(3), jnp.full(3, -1.0), jnp.full(3, 2.0), num_iters=50)
    np.testing.assert_allclose(np.asarray(out.x), [2.0, 2.0, 2.0], atol=1e-5)


@pytest.mark.parametrize("apply_correction", [False, True])
def test_full_chain_ik_roundtrip(model, apply_correction):
    """FK -> IK roundtrip: marker positions generated at a known pose must be
    recovered to sub-degree / sub-mm (SURVEY.md §4 seam (b))."""
    true_angles = jnp.array([0.5, -0.4, 0.7, 0.3, -0.6, 0.9])
    base = T.translate(jnp.array([20.0, -30.0, 5.0])) @ T.rot_z(jnp.float32(0.2))
    local6 = model.marker_local[model.link_index("Joint6")]
    if apply_correction:
        local6 = local6 * jnp.asarray([-1.0, -1.0, 1.0])
    j6_targets = T.apply(fk_all_links(model, true_angles, base)[model.link_index("Joint6")], local6)

    result = solve_full_chain_ik(
        model, j6_targets, base, apply_correction=apply_correction, num_iters=80
    )
    assert float(result.rmse) < 0.1, float(result.rmse)
    # The chain is kinematically multi-modal (elbow branches): from a cold
    # start the solver may land on a different valid branch, exactly as the
    # reference's scipy TRF would. The invariant is marker reproduction.
    solved_markers = T.apply(
        fk_all_links(model, result.angles, base)[model.link_index("Joint6")], local6
    )
    np.testing.assert_allclose(np.asarray(solved_markers), np.asarray(j6_targets), atol=0.2)

    # Warm-started near the truth (the reference's "current pose" restart),
    # the exact branch is recovered to sub-degree.
    warm = solve_full_chain_ik(
        model,
        j6_targets,
        base,
        current_angles=true_angles + 0.05,
        apply_correction=apply_correction,
        num_iters=80,
        num_random_restarts=0,  # strict reference 2-guess behavior
    )
    err_deg = np.rad2deg(np.abs(np.asarray(warm.angles - true_angles)))
    assert np.all(err_deg < 0.5), err_deg


def test_full_chain_ik_with_joint4_secondary(model):
    true_angles = jnp.array([-0.3, 0.5, -0.8, 1.1, 0.4, -0.7])
    base = T.translate(jnp.array([0.0, 50.0, 0.0]))
    j6_targets = marker_world_positions(model, true_angles, "Joint6", base)
    j4_targets = marker_world_positions(model, true_angles, "Joint4", base)
    result = solve_full_chain_ik(
        model, j6_targets, base, joint4_targets=j4_targets, joint4_found=True, num_iters=100
    )
    assert float(result.rmse) < 0.1
    err_deg = np.rad2deg(np.abs(np.asarray(result.angles - true_angles)))
    assert np.all(err_deg < 1.0), err_deg


def test_joint4_weight_zero_when_absent(model):
    angles = jnp.zeros(6)
    base = jnp.eye(4)
    j6 = marker_world_positions(model, angles, "Joint6")
    r_without = full_chain_residual(model, angles, base, j6, False)
    r_with_garbage = full_chain_residual(
        model, angles, base, j6, False, joint4_targets=jnp.full((3, 3), 1e6), joint4_found=False
    )
    np.testing.assert_allclose(np.asarray(r_without), np.asarray(r_with_garbage), atol=0)
    assert r_without.shape == (18,)
    np.testing.assert_allclose(np.asarray(r_without[:9]), 0.0, atol=1e-4)


def test_trajectory_residual_needle_direction(model):
    """The needle points along -X of its FK frame (Mamri.py:1551): at zero
    pose the FK frame is identity-oriented, so a target x-axis of (-1,0,0)
    zeroes the orientation error."""
    angles = jnp.zeros(6)
    target = jnp.eye(4).at[:3, 0].set(jnp.array([-1.0, 0.0, 0.0]))
    target = target.at[:3, 3].set(jnp.array([-50.0, 0.0, 439.0]))  # needle root at zero pose
    r = trajectory_pose_residual(model, angles, jnp.eye(4), target)
    np.testing.assert_allclose(np.asarray(r), np.zeros(6), atol=1e-4)


def test_trajectory_ik_reaches_pose(model):
    """Solve for a reachable needle pose and check position error < 1 mm."""
    true_angles = jnp.array([0.4, 0.3, -0.5, 0.2, 0.6, -0.3])
    base = jnp.eye(4)
    needle_tf = fk_all_links(model, true_angles, base)[model.link_index("Needle")]
    target = jnp.asarray(needle_tf).at[:3, 0].set(-needle_tf[:3, 0])  # target x = needle dir

    def res(x):
        return trajectory_pose_residual(model, x, base, target)

    lower = model.limits_rad[:, 0]
    upper = model.limits_rad[:, 1]
    out = least_squares_lm(res, jnp.zeros(6), lower, upper, num_iters=120)
    pos_err = np.linalg.norm(np.asarray(res(out.x))[:3])
    assert pos_err < 1.0, pos_err


def test_ik_jit_and_batch(model):
    angles_batch = jnp.stack([jnp.zeros(6), jnp.array([0.2, -0.1, 0.3, 0.0, 0.1, -0.2])])
    base = jnp.eye(4)

    def solve_one(true_angles):
        j6 = marker_world_positions(model, true_angles, "Joint6", base)
        return solve_full_chain_ik(model, j6, base, num_iters=60).angles

    solved = jax.jit(jax.vmap(solve_one))(angles_batch)
    err = np.rad2deg(np.abs(np.asarray(solved - angles_batch)))
    assert np.all(err < 1.0), err
