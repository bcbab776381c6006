"""Bounded Levenberg-Marquardt nonlinear least squares in pure JAX.

Replacement for the reference's `scipy.optimize.least_squares(method='trf')`
calls (Mamri/Mamri.py:925-928, :1430-1433). SciPy's compiled TRF cannot run
on-device; LM with Marquardt diagonal scaling, a multiplicative damping
schedule, and box-constraint projection is jit-compilable with a *fixed*
iteration count, differentiates the residual with `jax.jacfwd`, and vmaps
cleanly over initial guesses (the reference restarts from current pose and
zero pose, Mamri/Mamri.py:921, :1425) and over batches of problems.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

_HIGHEST = lax.Precision.HIGHEST


class LMResult(NamedTuple):
    x: jnp.ndarray  # (n,) solution
    cost: jnp.ndarray  # () final cost = 0.5 * sum(r^2)  (SciPy's convention)
    grad_norm: jnp.ndarray  # () |J^T r| at solution
    iterations: jnp.ndarray  # () accepted-step count


def least_squares_lm(
    residual_fn: Callable,
    x0,
    lower,
    upper,
    num_iters: int = 60,
    mu0: float = 1e-3,
    mu_inc: float = 4.0,
    mu_dec: float = 0.35,
    jac_eps: float = 1e-10,
) -> LMResult:
    """Minimize 0.5*|residual_fn(x)|^2 subject to lower <= x <= upper.

    Fixed `num_iters` trust-region-style iterations: solve
    (J^T J + mu * diag(J^T J)) d = -J^T r, project the step onto the box,
    accept on cost decrease (mu shrinks) else reject (mu grows). Everything is
    static-shaped, so the call jits once and vmaps over guesses/batches.
    """
    x0 = jnp.clip(jnp.asarray(x0), lower, upper)
    n = x0.shape[0]

    def cost_of(x):
        r = residual_fn(x)
        return 0.5 * jnp.sum(r * r)

    def step(carry, _):
        x, mu, c, accepted = carry
        r = residual_fn(x)
        jac = jax.jacfwd(residual_fn)(x)  # (m, n)
        g = jnp.matmul(jac.T, r, precision=_HIGHEST)
        h = jnp.matmul(jac.T, jac, precision=_HIGHEST)
        diag = jnp.maximum(jnp.diag(h), jac_eps)
        h_damped = h + mu * jnp.diag(diag) + jac_eps * jnp.eye(n, dtype=x.dtype)
        delta = jnp.linalg.solve(h_damped, -g)
        x_new = jnp.clip(x + delta, lower, upper)
        c_new = cost_of(x_new)
        improve = c_new < c
        x = jnp.where(improve, x_new, x)
        c = jnp.where(improve, c_new, c)
        mu = jnp.where(improve, mu * mu_dec, mu * mu_inc)
        mu = jnp.clip(mu, 1e-12, 1e12)
        accepted = accepted + improve.astype(jnp.int32)
        return (x, mu, c, accepted), None

    c0 = cost_of(x0)
    (x, _, c, accepted), _ = lax.scan(
        step, (x0, jnp.asarray(mu0, x0.dtype), c0, jnp.int32(0)), None, length=num_iters
    )
    r = residual_fn(x)
    jac = jax.jacfwd(residual_fn)(x)
    g = jnp.matmul(jac.T, r, precision=_HIGHEST)
    return LMResult(x=x, cost=c, grad_norm=jnp.linalg.norm(g), iterations=accepted)


def multistart_lm(residual_fn, guesses, lower, upper, **kw) -> LMResult:
    """Run LM from several initial guesses (leading axis) and keep the best.

    Mirrors the reference's best-of-restarts selection by final cost
    (Mamri/Mamri.py:1434-1437).
    """
    results = jax.vmap(lambda g: least_squares_lm(residual_fn, g, lower, upper, **kw))(guesses)
    best = jnp.argmin(results.cost)
    return LMResult(
        x=results.x[best],
        cost=results.cost[best],
        grad_norm=results.grad_norm[best],
        iterations=results.iterations[best],
    ), best
