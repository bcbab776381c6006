"""Heuristic "up, over, down" path planning.

Parity with the reference's `planHeuristicPath` (Mamri/Mamri.py:941-985):
  keyframes = [start,
               start with Joint2 = -15 deg        ("up"),
               previous with Joint1 = goal Joint1 ("over"),
               goal]                              ("down")
  path = piecewise linear, total_steps samples split 25/25/50 with
         t = j/steps per segment, plus the final goal appended (101 points).
Collision checking of the whole path is one vmapped grid lookup instead of
the reference's sequential 101 x 6 VTK mesh tests.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from mamri_tpu.core.robot import RobotModel
from mamri_tpu.planning.collision import CollisionWorld, config_collides

UP_JOINT2_RAD = math.radians(-15.0)


def heuristic_keyframes(start_config, goal_config):
    """(4, J) keyframe stack for the up-over-down maneuver."""
    start = jnp.asarray(start_config)
    goal = jnp.asarray(goal_config)
    w1 = start.at[1].set(UP_JOINT2_RAD)
    w2 = w1.at[0].set(goal[0])
    return jnp.stack([start, w1, w2, goal])


def interpolate_path(keyframes, total_steps: int = 100):
    """(total_steps + 1, J) linear interpolation with the reference's 25/25/50
    segment split and endpoint handling."""
    keyframes = jnp.asarray(keyframes)
    segment_steps = [total_steps // 4, total_steps // 4, total_steps // 2]
    rows = []
    for i, steps in enumerate(segment_steps):
        a, b = keyframes[i], keyframes[i + 1]
        t = jnp.arange(steps, dtype=keyframes.dtype)[:, None] / float(steps)
        rows.append(a[None, :] + t * (b - a)[None, :])
    rows.append(keyframes[-1][None, :])
    return jnp.concatenate(rows, axis=0)


def check_path_collisions(model: RobotModel, geometry, path, base_tf, world: CollisionWorld):
    """(P,) per-sample collision flags for a whole path, vmapped on-device."""
    fn = lambda cfg: config_collides(
        model, geometry.part_points, geometry.part_link_idx, cfg, base_tf, world
    )
    return jax.vmap(fn)(jnp.asarray(path))
