"""Joint-angle <-> motor-step conversion.

Parity with the reference (Mamri/Mamri.py:1621-1644):
  steps  = int(angle_rad * steps_per_rev / (2*pi))   # Python int() => truncation toward zero
  angle  = steps * (2*pi / steps_per_rev)
All six MAMRI joints use steps_per_rev = 3332.
"""

from __future__ import annotations

import jax.numpy as jnp


def angles_to_steps(angles_rad, steps_per_rev):
    """(..., J) radians -> (..., J) int32 motor steps (truncation toward zero)."""
    angles_rad = jnp.asarray(angles_rad)
    spr = jnp.asarray(steps_per_rev, dtype=angles_rad.dtype)
    raw = angles_rad * (spr / (2.0 * jnp.pi))
    return jnp.trunc(raw).astype(jnp.int32)


def steps_to_angles(steps, steps_per_rev, dtype=jnp.float32):
    """(..., J) motor steps -> (..., J) radians."""
    steps = jnp.asarray(steps).astype(dtype)
    spr = jnp.asarray(steps_per_rev, dtype=dtype)
    return steps * ((2.0 * jnp.pi) / spr)
