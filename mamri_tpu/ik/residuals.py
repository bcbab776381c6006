"""IK residual functions + the full-chain pose solver.

Parity targets:
  * `full_chain_residual`  <->  reference `_full_chain_ik_error_function`
    (Mamri/Mamri.py:1507-1536): 9 Joint6 marker-coordinate errors, an optional
    180-deg Z correction of the Joint6 local marker frame (:1511-1514), and an
    optional Joint4 secondary objective weighted 0.05 (:1507, :1533). Here the
    Joint4 block is always present with weight 0 when absent — identical least
    squares, static shapes.
  * `trajectory_pose_residual`  <->  the pose part of
    `_ik_pose_and_collision_error_function` (Mamri/Mamri.py:1538-1553):
    3 position errors of the Needle frame plus 50 * (target_x - (-fk_x)) —
    the needle points along the *negative* X axis of its FK frame (:1551).
    The collision term is composed in planning/ (smooth penetration penalty
    instead of the reference's constant 1e4 wall, which has zero gradient).
  * `solve_full_chain_ik`  <->  `_solve_full_chain_ik`
    (Mamri/Mamri.py:1410-1447): restarts from {current pose, zero pose},
    bounded by joint limits, best result by cost; RMSE computed over the
    Joint6-only error vector (:1444-1445).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from mamri_tpu.core import transforms
from mamri_tpu.core.robot import RobotModel, fk_all_links
from mamri_tpu.ik.lm import least_squares_lm, multistart_lm

JOINT4_WEIGHT = 0.05
ORIENTATION_WEIGHT = 50.0

_CORRECTION_FLIP = jnp.asarray([-1.0, -1.0, 1.0])  # RotZ(180) on local coords


def full_chain_residual(
    model: RobotModel,
    angles,
    base_tf,
    joint6_targets,
    apply_correction,
    joint4_targets=None,
    joint4_found=False,
    joint4_weight: float = JOINT4_WEIGHT,
):
    """(18,) marker-position residual for the pose-estimation IK.

    Args:
      joint6_targets: (3, 3) detected Joint6 marker world positions (RAS mm).
      apply_correction: traced bool — rotate Joint6 local markers 180 deg
        about Z before projecting (reference's end-effector correction flag).
      joint4_targets: optional (3, 3); zero-weighted when joint4_found=False.
    """
    angles = jnp.asarray(angles)
    idx6 = model.link_index("Joint6")
    idx4 = model.link_index("Joint4")
    tfs = fk_all_links(model, angles, base_tf)

    local6 = model.marker_local[idx6]
    local6 = jnp.where(jnp.asarray(apply_correction), local6 * _CORRECTION_FLIP, local6)
    pred6 = transforms.apply(tfs[idx6], local6)
    e6 = (pred6 - jnp.asarray(joint6_targets)).reshape(-1)

    if joint4_targets is None:
        joint4_targets = jnp.zeros((3, 3), dtype=angles.dtype)
    w4 = jnp.where(jnp.asarray(joint4_found), joint4_weight, 0.0)
    pred4 = transforms.apply(tfs[idx4], model.marker_local[idx4])
    e4 = (w4 * (pred4 - jnp.asarray(joint4_targets))).reshape(-1)
    return jnp.concatenate([e6, e4])


def trajectory_pose_residual(model: RobotModel, angles, base_tf, target_tf, orientation_weight: float = ORIENTATION_WEIGHT):
    """(6,) needle position+orientation residual for the trajectory IK."""
    tfs = fk_all_links(model, jnp.asarray(angles), base_tf)
    needle = tfs[model.link_index("Needle")]
    target_tf = jnp.asarray(target_tf)
    pos_err = needle[:3, 3] - target_tf[:3, 3]
    actual_needle_dir = -needle[:3, 0]
    orient_err = orientation_weight * (target_tf[:3, 0] - actual_needle_dir)
    return jnp.concatenate([pos_err, orient_err])


class FullChainIKResult(NamedTuple):
    angles: jnp.ndarray  # (J,)
    rmse: jnp.ndarray  # () over the 9 Joint6 errors (reference convention)
    cost: jnp.ndarray  # () best 0.5*|r|^2
    best_guess: jnp.ndarray  # () which restart won (0=current, 1=zero)
    grad_norm: jnp.ndarray


def solve_full_chain_ik(
    model: RobotModel,
    joint6_targets,
    base_tf,
    current_angles=None,
    apply_correction=False,
    joint4_targets=None,
    joint4_found=False,
    num_iters: int = 80,
    num_random_restarts: int = 8,
    restart_seed: int = 0,
) -> FullChainIKResult:
    """Full-chain pose IK with the reference's restart/bounds/RMSE semantics.

    The reference restarts from {current pose, zero pose} only — scipy TRF on
    a CPU makes restarts expensive. Here restarts are a vmapped axis, so we
    add `num_random_restarts` deterministic in-bounds guesses essentially for
    free; projected-LM escapes the bound-pinned local minima that trap the
    2-guess scheme. Set num_random_restarts=0 for strict reference behavior.
    """
    import jax

    nj = model.num_joints
    if current_angles is None:
        current_angles = jnp.zeros(nj, dtype=model.limits_rad.dtype)
    lower = model.limits_rad[:, 0]
    upper = model.limits_rad[:, 1]
    guesses = [jnp.asarray(current_angles), jnp.zeros(nj, dtype=model.limits_rad.dtype)]
    if num_random_restarts > 0:
        key = jax.random.PRNGKey(restart_seed)
        rand = jax.random.uniform(
            key, (num_random_restarts, nj), minval=lower * 0.8, maxval=upper * 0.8
        )
        guesses = jnp.concatenate([jnp.stack(guesses), rand])
    else:
        guesses = jnp.stack(guesses)

    def res(x):
        return full_chain_residual(
            model, x, base_tf, joint6_targets, apply_correction, joint4_targets, joint4_found
        )

    best, best_idx = multistart_lm(res, guesses, lower, upper, num_iters=num_iters)

    # RMSE over the Joint6-only error vector, like the reference's
    # final_error_vector without the joint4 arguments (Mamri.py:1444-1445).
    e6 = full_chain_residual(model, best.x, base_tf, joint6_targets, apply_correction)[:9]
    rmse = jnp.sqrt(jnp.mean(e6 * e6))
    return FullChainIKResult(
        angles=best.x, rmse=rmse, cost=best.cost, best_guess=best_idx, grad_norm=best.grad_norm
    )
