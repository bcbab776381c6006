import jax
import jax.numpy as jnp
import numpy as np

from mamri_tpu.core import transforms as T
from mamri_tpu.registration.kabsch import kabsch_rigid_transform


def _random_rigid(rng):
    # random rotation via QR of gaussian, fix det, random translation
    a = rng.normal(size=(3, 3))
    q, r = np.linalg.qr(a)
    q = q * np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = q
    m[:3, 3] = rng.uniform(-100, 100, size=3)
    return m


def test_recovers_random_rigid_transforms():
    rng = np.random.default_rng(0)
    local = np.array([[-10.0, 20.0, 5.0], [10.0, 20.0, 5.0], [-10.0, -20.0, 5.0]], dtype=np.float32)
    for _ in range(20):
        m = _random_rigid(rng)
        world = np.asarray(T.apply(jnp.asarray(m), jnp.asarray(local)))
        est = np.asarray(kabsch_rigid_transform(jnp.asarray(local), jnp.asarray(world)))
        np.testing.assert_allclose(est, m, atol=2e-3)


def test_no_reflection_for_degenerate_sets():
    # coplanar points (all marker triplets are) must still yield det(R)=+1
    rng = np.random.default_rng(1)
    local = np.array([[0.0, 0.0, 0.0], [40.0, 0.0, 0.0], [0.0, 20.0, 0.0]], dtype=np.float32)
    for _ in range(10):
        m = _random_rigid(rng)
        world = np.asarray(T.apply(jnp.asarray(m), jnp.asarray(local)))
        est = np.asarray(kabsch_rigid_transform(jnp.asarray(local), jnp.asarray(world)))
        assert np.linalg.det(est[:3, :3]) > 0.99
        np.testing.assert_allclose(est[:3, 3], m[:3, 3], atol=2e-3)


def test_batched_and_jitted():
    """Batched well-conditioned (L-shaped) triplets, like real marker sets.
    float32 SVD is accurate to ~1e-3 here; ill-conditioned (near-collinear)
    sets degrade — real marker L-shapes are never collinear."""
    rng = np.random.default_rng(2)
    local = np.tile(
        np.array([[0.0, 0.0, 0.0], [40.0, 0.0, 0.0], [0.0, 20.0, 0.0]], dtype=np.float32), (5, 1, 1)
    )
    ms = np.stack([_random_rigid(rng) for _ in range(5)])
    world = np.einsum("bij,bnj->bni", ms[:, :3, :3], local) + ms[:, None, :3, 3]
    est = jax.jit(kabsch_rigid_transform)(jnp.asarray(local), jnp.asarray(world.astype(np.float32)))
    np.testing.assert_allclose(np.asarray(est), ms, atol=2e-3)


def test_exact_translation_only():
    local = np.array([[0.0, 0.0, 0.0], [40.0, 0.0, 0.0], [0.0, 20.0, 0.0]], dtype=np.float32)
    world = local + np.array([10.0, -20.0, 30.0], dtype=np.float32)
    est = np.asarray(kabsch_rigid_transform(jnp.asarray(local), jnp.asarray(world)))
    np.testing.assert_allclose(est[:3, :3], np.eye(3), atol=1e-5)
    np.testing.assert_allclose(est[:3, 3], [10.0, -20.0, 30.0], atol=1e-4)
