"""Multi-device sharding tests on the virtual 8-CPU mesh (conftest forces
JAX_PLATFORMS=cpu with --xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamri_tpu.api import MamriEngine
from mamri_tpu.parallel import make_mesh, sharded_batched_pipeline
from mamri_tpu.perception.volume import synthetic_volume


@pytest.fixture(scope="module")
def engine():
    return MamriEngine(ik_iters=10, ik_restarts=0)


def _scene(engine, spacing=6.0):
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _example_volume

    return _example_volume(engine, spacing=spacing)


def test_eight_devices_available():
    assert len(jax.devices()) == 8
    assert jax.devices()[0].platform == "cpu"


def test_mesh_shapes():
    m1 = make_mesh(8, axes=("dp",))
    assert m1.devices.shape == (8,)
    m2 = make_mesh(8, axes=("dp", "sp"))
    assert m2.devices.shape == (2, 4)
    m3 = make_mesh(4, axes=("dp", "sp"))
    assert m3.devices.shape == (2, 2)


def test_dp_sharded_batch_matches_single_device(engine):
    vol = _scene(engine)
    mesh = make_mesh(4, axes=("dp",))
    fn = sharded_batched_pipeline(engine, mesh)
    batch = jnp.asarray(np.broadcast_to(vol.data, (4,) + vol.data.shape).copy())
    out = fn(batch, jnp.asarray(vol.spacing), jnp.asarray(vol.origin), jnp.asarray(False))
    jax.block_until_ready(out)
    # all four shards computed the same volume -> identical results
    angles = np.asarray(out["angles"])
    assert angles.shape == (4, 6)
    np.testing.assert_allclose(angles[0], angles[3], atol=1e-5)
    # compare against the unsharded batched path
    ref = engine.estimate_pose_batch(batch[:1], vol.spacing, vol.origin)
    np.testing.assert_allclose(angles[0], np.asarray(ref["angles"])[0], atol=1e-4)


def test_dp_sp_sharded_segmentation_consistent(engine):
    """Spatially sharding the volume's x extent must not change results:
    XLA inserts halo exchanges for the shifted/scanned ops."""
    vol = _scene(engine)
    data = vol.data
    pad_x = (-data.shape[0]) % 4
    if pad_x:
        data = np.pad(data, ((0, pad_x), (0, 0), (0, 0)), constant_values=10.0)
    mesh = make_mesh(8, axes=("dp", "sp"))  # 2 x 4
    fn = sharded_batched_pipeline(engine, mesh, sp_axis="sp")
    batch = jnp.asarray(np.broadcast_to(data, (2,) + data.shape).copy())
    out = fn(batch, jnp.asarray(vol.spacing), jnp.asarray(vol.origin), jnp.asarray(False))
    jax.block_until_ready(out)
    ref = engine.estimate_pose_batch(batch[:1], vol.spacing, vol.origin)
    np.testing.assert_allclose(
        np.asarray(out["angles"])[0], np.asarray(ref["angles"])[0], atol=1e-4
    )
    assert np.asarray(out["num_blobs"])[0] == np.asarray(ref["num_blobs"])[0]


def test_graft_entry_contract():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert bool(out["success"])

    g.dryrun_multichip(8)
