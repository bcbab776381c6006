import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamri_tpu.core import transforms as T
from mamri_tpu.core.robot import fk_all_links, fk_link, load_robot_model, marker_world_positions


@pytest.fixture(scope="module")
def model():
    return load_robot_model()


def test_model_shape(model):
    assert model.num_links == 8
    assert model.num_joints == 6
    assert model.articulated_names == ("Joint1", "Joint2", "Joint3", "Joint4", "Joint5", "Joint6")
    assert model.link_names[0] == "Baseplate"
    assert model.link_names[-1] == "Needle"
    assert model.motor_letters == ("A", "B", "C", "D", "E", "F")


def test_fk_zero_pose_hand_computed(model):
    """At zero angles every articulation is identity, so world translations are
    the cumulative fixed offsets: Baseplate 0, J1 +20, J2 +50, J3 +200, J4 +200,
    J5 +355, J6 +368 on Z, Needle at (-50, 0, 439) (robot_config.json offsets)."""
    tfs = fk_all_links(model, jnp.zeros(6))
    z = np.asarray(tfs[:, 2, 3])
    np.testing.assert_allclose(z, [0.0, 20.0, 50.0, 200.0, 200.0, 355.0, 368.0, 439.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(tfs[-1, :3, 3]), [-50.0, 0.0, 439.0], atol=1e-5)
    # zero pose: all rotations identity
    np.testing.assert_allclose(np.asarray(tfs[-1, :3, :3]), np.eye(3), atol=1e-6)


def test_fk_joint1_rotation_spins_whole_arm(model):
    """Rotating Joint1 (IS = +Z) by 90 deg moves the needle root from -X to +Y."""
    angles = jnp.zeros(6).at[0].set(jnp.pi / 2)
    tfs = fk_all_links(model, angles)
    needle_pos = np.asarray(tfs[-1, :3, 3])
    np.testing.assert_allclose(needle_pos, [0.0, -50.0, 439.0], atol=1e-4)


def test_fk_joint2_pa_rotation(model):
    """PA axis is RotY(-theta): +90 deg at Joint2 tips the arm so points above
    Joint2 move toward -X."""
    angles = jnp.zeros(6).at[1].set(jnp.pi / 2)
    tfs = fk_all_links(model, angles)
    # Joint3 offset (0,0,150) from Joint2 at z=50: rot_y(-pi/2) maps (0,0,150)->(-150,0,0)
    j3 = np.asarray(tfs[3, :3, 3])
    np.testing.assert_allclose(j3, [-150.0, 0.0, 50.0], atol=1e-4)


def test_fk_with_base_transform(model):
    base = T.translate(jnp.array([5.0, -7.0, 2.0])) @ T.rot_z(jnp.float32(0.4))
    tfs = fk_all_links(model, jnp.zeros(6), base)
    np.testing.assert_allclose(np.asarray(tfs[0]), np.asarray(base), atol=1e-6)
    # entire chain rides the base transform
    expected_needle = np.asarray(T.apply(base, jnp.array([[-50.0, 0.0, 439.0]]))[0])
    np.testing.assert_allclose(np.asarray(tfs[-1, :3, 3]), expected_needle, atol=1e-4)


def test_fk_vmap_and_jit(model):
    batch_angles = jnp.stack([jnp.zeros(6), jnp.ones(6) * 0.1, jnp.ones(6) * -0.2])
    fk_b = jax.jit(jax.vmap(lambda a: fk_all_links(model, a)))
    out = fk_b(batch_angles)
    assert out.shape == (3, 8, 4, 4)
    single = fk_all_links(model, batch_angles[1])
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(single), atol=1e-6)


def test_marker_world_positions_zero_pose(model):
    pts = marker_world_positions(model, jnp.zeros(6), "Joint6")
    # Joint6 world origin at z=368; local markers [-10,22.5,26] etc.
    np.testing.assert_allclose(
        np.asarray(pts), [[-10.0, 22.5, 394.0], [10.0, 22.5, 394.0], [-10.0, -22.5, 394.0]], atol=1e-4
    )


def test_fk_differentiable(model):
    def needle_x(angles):
        return fk_link(model, angles, "Needle")[0, 3]

    base = jnp.array([0.3, -0.5, 0.8, 0.2, -0.4, 1.0])
    g = jax.grad(needle_x)(base)
    assert np.all(np.isfinite(np.asarray(g)))
    eps = 1e-3
    for j in range(6):
        fd = (needle_x(base.at[j].set(base[j] + eps)) - needle_x(base.at[j].set(base[j] - eps))) / (2 * eps)
        assert abs(float(g[j]) - float(fd)) < 5e-2, (j, float(g[j]), float(fd))


def test_load_robot_model_malformed_json_fails_loudly(tmp_path):
    """Structural mutations of the definition file (missing keys, wrong
    types, truncated link lists) raise ValueError naming the file — never
    KeyError/TypeError (the definition is a user-editable file)."""
    import copy
    import json

    import pytest

    from mamri_tpu.core.robot import default_config_path, load_robot_model

    src = json.load(open(default_config_path()))
    rng = np.random.default_rng(6)

    def mutate(d):
        d = copy.deepcopy(d)
        mode = rng.integers(0, 4)
        if mode == 0 and d:
            del d[list(d.keys())[rng.integers(0, len(d))]]
        elif mode == 1 and d.get("links"):
            lk = d["links"][rng.integers(0, len(d["links"]))]
            if lk:
                del lk[list(lk.keys())[rng.integers(0, len(lk))]]
        elif mode == 2 and d.get("links"):
            lk = d["links"][rng.integers(0, len(d["links"]))]
            if lk:
                lk[list(lk.keys())[rng.integers(0, len(lk))]] = ["bad", None]
        elif "links" in d:
            d["links"] = d["links"][: rng.integers(0, len(d["links"]))]
        return d

    p = tmp_path / "bad.json"
    for _ in range(60):
        p.write_text(json.dumps(mutate(src)))
        try:
            load_robot_model(str(p))
        except ValueError:
            pass
    p.write_text("{not json")
    with pytest.raises(ValueError):
        load_robot_model(str(p))


def test_fk_host_twin_matches_device(model):
    from mamri_tpu.core.robot import fk_all_links_host

    rng = np.random.default_rng(7)
    base = np.asarray(
        T.translate(jnp.array([12.0, -30.0, 55.0])) @ T.rot_x(-np.pi / 2) @ T.rot_z(0.6)
    )
    for _ in range(8):
        angles = rng.uniform(-1.4, 1.4, size=model.num_joints).astype(np.float32)
        dev = np.asarray(fk_all_links(model, jnp.asarray(angles), jnp.asarray(base)))
        host = fk_all_links_host(model, angles, base)
        # translation agreement well inside the ROI anchor's 40 mm margin
        # and the live-mirror display precision (0.001 mm)
        assert np.abs(dev[:, :3, 3] - host[:, :3, 3]).max() < 1e-2
        assert np.abs(dev - host).max() < 1e-4


def test_fk_host_rejects_wrong_length(model):
    from mamri_tpu.core.robot import fk_all_links_host

    with pytest.raises(ValueError):
        fk_all_links_host(model, np.zeros(model.num_joints + 1))
