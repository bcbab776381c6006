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
from mamri_tpu.ik.lm import least_squares_lm

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


def _wrap_pi(a):
    return jnp.where(a > jnp.pi, a - 2 * jnp.pi, jnp.where(a < -jnp.pi, a + 2 * jnp.pi, a))


def symmetry_twin(angles):
    """The MAMRI chain's exact marker-preserving symmetry.

    (J1+pi, -J2, -J3, J4+pi, J5, J6) maps every Joint4 AND Joint6 marker to
    the identical world position (verified to 0 mm numerically): the IS-PA-PA-
    IS-PA-IS axis pattern lets a 180-deg base twist be undone by negating the
    two shoulder PA joints and re-twisting at Joint4. The full-chain IK
    objective (reference `_full_chain_ik_error_function`, Mamri/Mamri.py:1507,
    which uses only Joint6 + weighted Joint4 markers) therefore has two
    exactly-equal-cost branches; the reference disambiguates only by local-
    optimizer luck from its two initial guesses (Mamri.py:1425)."""
    a = jnp.asarray(angles)
    return jnp.stack(
        [_wrap_pi(a[0] + jnp.pi), -a[1], -a[2], _wrap_pi(a[3] + jnp.pi), a[4], a[5]]
    )


def wrist_twin(angles):
    """The wrist's exact Joint6-FRAME-preserving flip.

    (J4+pi, -J5, J6+pi) maps the Joint6 frame (hence all Joint6 markers) to
    itself exactly — Rz(pi) conjugation flips the PA joint's sign — while
    rotating Joint4's markers by 180 deg about its axis. With the Joint4
    triplet weighted 0.05 (Mamri/Mamri.py:1507) this branch is a strong local
    minimum a local solver can get stuck in; with Joint4 undetected it is an
    exact equal-cost ambiguity."""
    a = jnp.asarray(angles)
    return jnp.stack(
        [a[0], a[1], a[2], _wrap_pi(a[3] + jnp.pi), -a[4], _wrap_pi(a[5] + jnp.pi)]
    )


def ik_branch_family(angles):
    """(12, nj) symmetry family: {id, shoulder twin} x {id, wrist flip} x
    Joint6 winding {-360, 0, +360} deg. Every member reaches the identical
    Joint6 marker positions."""
    angles = jnp.asarray(angles)
    two_pi = 2 * jnp.pi
    cands = []
    for shoulder in (angles, symmetry_twin(angles)):
        for branch in (shoulder, wrist_twin(shoulder)):
            for w in (-1.0, 0.0, 1.0):
                cands.append(branch.at[5].add(w * two_pi))
    return jnp.stack(cands)


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
    joint2_targets=None,
    joint2_found=False,
    use_analytic_seeds: bool = True,
) -> FullChainIKResult:
    """Full-chain pose IK with the reference's restart/bounds/RMSE semantics.

    The reference restarts from {current pose, zero pose} only — scipy TRF on
    a CPU makes restarts expensive. Here restarts are a vmapped axis, so we
    add `num_random_restarts` deterministic in-bounds guesses essentially for
    free; projected-LM escapes the bound-pinned local minima that trap the
    2-guess scheme. Set num_random_restarts=0 and use_analytic_seeds=False for
    strict reference emulation ({current, zeros} local search only).

    Guesses: the reference's {current pose, zeros}, plus ALL EIGHT closed-form
    IK branches derived from the Joint6 frame the triplet itself implies
    (see ik/analytic.py) — so the LM step is a short polish, not a search —
    plus optional random restarts. The polished guesses are scored by
    (residual cost, then detected-Joint2-triplet evidence, then distance to
    `current_angles`): cost separates the elbow/wrist branches through the
    Joint4 term, the Joint2 triplet separates the shoulder branches whose cost
    is EXACTLY equal (see `symmetry_twin`), and distance resolves what physical
    evidence cannot — deterministically, where the reference depends on which
    basin its local solver happens to enter (Mamri/Mamri.py:1425).
    The Joint6 +-360-deg winding (limits span 540 deg) is resolved last,
    toward the current pose, at exactly equal cost.
    """
    import jax

    from mamri_tpu.ik.analytic import (
        analytic_ik_seeds,
        chain_is_analytic,
        joint6_frame_from_markers,
    )

    nj = model.num_joints
    if current_angles is None:
        current_angles = jnp.zeros(nj, dtype=model.limits_rad.dtype)
    current_angles = jnp.asarray(current_angles)
    lower = model.limits_rad[:, 0]
    upper = model.limits_rad[:, 1]
    guesses = [jnp.stack([current_angles, jnp.zeros(nj, dtype=model.limits_rad.dtype)])]
    if use_analytic_seeds and chain_is_analytic(model):
        frame = joint6_frame_from_markers(model, joint6_targets, apply_correction)
        guesses.append(analytic_ik_seeds(model, frame, base_tf))
    if num_random_restarts > 0:
        key = jax.random.PRNGKey(restart_seed)
        guesses.append(
            jax.random.uniform(
                key, (num_random_restarts, nj), minval=lower * 0.8, maxval=upper * 0.8
            )
        )
    guesses = jnp.concatenate(guesses)

    def res(x):
        return full_chain_residual(
            model, x, base_tf, joint6_targets, apply_correction, joint4_targets, joint4_found
        )

    results = jax.vmap(
        lambda g: least_squares_lm(res, g, lower, upper, num_iters=num_iters)
    )(guesses)

    dist = jnp.sum((results.x - current_angles) ** 2, axis=1)
    score = results.cost + 1e-4 * dist
    if joint2_targets is not None:
        idx2 = model.link_index("Joint2")
        local2 = model.marker_local[idx2]

        def j2_err(x):
            tfs = fk_all_links(model, x, base_tf)
            pred = transforms.apply(tfs[idx2], local2)
            return jnp.sum((pred - jnp.asarray(joint2_targets)) ** 2)

        j2_errs = jax.vmap(j2_err)(results.x)
        score = score + jnp.where(jnp.asarray(joint2_found), 1e-2 * j2_errs, 0.0)
    sel = jnp.argmin(score)
    angles = results.x[sel]
    cost = results.cost[sel]
    grad_norm = results.grad_norm[sel]

    # Joint6 winding: a6 and a6 +- 360 deg are the same physical pose; prefer
    # the in-limits winding nearest the current pose (exactly equal cost).
    two_pi = 2 * jnp.pi
    a6 = angles[5]
    winds = jnp.stack([a6 - two_pi, a6, a6 + two_pi])
    ok = jnp.logical_and(winds >= lower[5], winds <= upper[5])
    wdist = jnp.where(ok, jnp.abs(winds - current_angles[5]), jnp.inf)
    angles = angles.at[5].set(winds[jnp.argmin(wdist)])

    # RMSE over the Joint6-only error vector, like the reference's
    # final_error_vector without the joint4 arguments (Mamri.py:1444-1445).
    e6 = full_chain_residual(model, angles, base_tf, joint6_targets, apply_correction)[:9]
    rmse = jnp.sqrt(jnp.mean(e6 * e6))
    return FullChainIKResult(
        angles=angles, rmse=rmse, cost=cost, best_guess=sel, grad_norm=grad_norm
    )
