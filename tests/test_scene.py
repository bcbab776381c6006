"""Assembled scene export: exact voxel surface geometry, closed primitive
meshes, and the OBJ writer (reference parity: the Slicer 3-D view,
Mamri/Mamri.py:1449-1471, 1924-1935)."""

import numpy as np

from mamri_tpu.utils.scene import (
    capsule_mesh,
    cylinder_mesh,
    read_obj_summary,
    voxel_surface_mesh,
    write_obj,
)


def _signed_volume(tris):
    """Divergence-theorem volume; positive iff windings are outward."""
    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
    return float(np.einsum("ij,ij->", a, np.cross(b, c)) / 6.0)


def test_single_voxel_surface_exact():
    mask = np.zeros((5, 5, 5), bool)
    mask[2, 2, 2] = True
    spacing = np.array([2.0, 3.0, 4.0], np.float32)
    origin = np.array([10.0, -20.0, 5.0], np.float32)
    tris = voxel_surface_mesh(mask, spacing, origin)
    assert tris.shape == (12, 3, 3)
    # signed volume equals the voxel volume, sign certifies outward normals in RAS
    assert abs(_signed_volume(tris) - 2.0 * 3.0 * 4.0) < 1e-3
    # centroid at the voxel center, LPS->RAS flipped
    center_lps = origin + spacing * 2
    center_ras = center_lps * np.array([-1.0, -1.0, 1.0])
    np.testing.assert_allclose(tris.reshape(-1, 3).mean(0), center_ras, atol=1e-4)


def test_voxel_bar_surface_merges_internal_faces():
    mask = np.zeros((6, 4, 4), bool)
    mask[1:4, 1, 1] = True  # 3-voxel bar: 3*6 - 2*2 = 14 faces = 28 tris
    tris = voxel_surface_mesh(mask, np.ones(3, np.float32), np.zeros(3, np.float32))
    assert tris.shape == (28, 3, 3)
    assert abs(_signed_volume(tris) - 3.0) < 1e-4


def test_capsule_and_cylinder_closed():
    cap = capsule_mesh(50.0, 10.0)
    # closed solid: volume = cylinder + sphere
    want = np.pi * 10.0**2 * 50.0 + 4.0 / 3.0 * np.pi * 10.0**3
    assert abs(_signed_volume(cap) - want) / want < 0.08  # faceting error only
    cyl = cylinder_mesh([0, 0, 0], [0, 0, 30.0], 5.0, n_seg=64)
    want = np.pi * 25.0 * 30.0
    assert abs(_signed_volume(cyl) - want) / want < 0.01
    # degenerate cylinder
    assert cylinder_mesh([1, 2, 3], [1, 2, 3], 5.0).shape == (0, 3, 3)


def test_write_obj_roundtrip(tmp_path):
    tris = capsule_mesh(20.0, 5.0, n_seg=8, n_rings=2)
    line = np.array([[0, 0, 0], [1, 1, 1], [2, 2, 2]], np.float32)
    path = str(tmp_path / "scene.obj")
    write_obj(path, [("PartA", tris), ("Empty", np.zeros((0, 3, 3), np.float32))], [("Path", line)])
    summary = read_obj_summary(path)
    assert summary["PartA"] == {"v": 3 * len(tris), "f": len(tris), "l": 0}
    assert summary["Empty"] == {"v": 0, "f": 0, "l": 0}
    assert summary["Path"] == {"v": 3, "f": 0, "l": 1}
    # face indices must all be in range (1-based OBJ)
    max_v = 3 * len(tris) + 3
    with open(path) as f:
        for ln in f:
            if ln.startswith(("f ", "l ")):
                assert all(0 < int(tok) <= max_v for tok in ln.split()[1:])


# ------------------------------------------------------------- renderer
def test_rasterize_zbuffer_occlusion():
    """Nearer triangle must win the z-buffer; background elsewhere."""
    from mamri_tpu.utils.render import rasterize

    # two parallel squares facing the default camera is fiddly; use the
    # camera axis directly: azim=0, elev=0 -> forward = (-1, 0, 0), so larger
    # x is nearer. Red square at x=10 should occlude blue square at x=0.
    def square(x, half, z0=0.0):
        a = np.array([x, -half, -half + z0])
        b = np.array([x, half, -half + z0])
        c = np.array([x, half, half + z0])
        d = np.array([x, -half, half + z0])
        return np.stack([np.stack([a, b, c]), np.stack([a, c, d])]).astype(np.float32)

    img = rasterize(
        [("far", square(0.0, 10.0)), ("near", square(10.0, 4.0))],
        width=64,
        height=64,
        azim_deg=0.0,
        elev_deg=0.0,
        colors={"far": (0, 0, 255), "near": (255, 0, 0)},
        light_dir=(1.0, 0.0, 0.0),
    )
    center = img[32, 32]
    assert center[0] > 150 and center[2] < 100, center  # near (red) wins
    edge = img[32, 8]  # inside far square only
    assert edge[2] > 150 and edge[0] < 100, edge
    corner = img[1, 1]
    assert tuple(corner) == (252, 252, 252)  # background


def test_png_roundtrip(tmp_path):
    from mamri_tpu.utils.render import read_png_size, write_png

    img = np.zeros((20, 30, 3), np.uint8)
    img[5:10, 5:10] = (255, 0, 0)
    p = str(tmp_path / "t.png")
    write_png(p, img)
    assert read_png_size(p) == (30, 20)
    # decodable by zlib path: verify IDAT integrity via full parse
    import struct, zlib

    with open(p, "rb") as f:
        data = f.read()
    pos = 8
    idat = b""
    while pos < len(data):
        ln, tag = struct.unpack(">I4s", data[pos : pos + 8])
        if tag == b"IDAT":
            idat += data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    raw = zlib.decompress(idat)
    assert len(raw) == 20 * (30 * 3 + 1)
    rows = np.frombuffer(raw, np.uint8).reshape(20, 91)[:, 1:].reshape(20, 30, 3)
    np.testing.assert_array_equal(rows, img)


# -------------------------------------------------------- marching tetrahedra
def test_marching_tetrahedra_watertight_sphere():
    from mamri_tpu.utils.scene import marching_tetrahedra_mesh

    n = 40
    idx = np.arange(n)
    x, y, z = np.meshgrid(idx, idx, idx, indexing="ij")
    mask = (x - 20.0) ** 2 + (y - 20.0) ** 2 + (z - 20.0) ** 2 <= 12.0**2
    spacing = np.array([1.5, 1.0, 2.0], np.float32)
    origin = np.array([-5.0, 3.0, -7.0], np.float32)
    tris = marching_tetrahedra_mesh(mask, spacing, origin)
    assert len(tris) > 0

    # watertight: every edge is shared by exactly two triangles
    v = tris.reshape(-1, 3)
    vq = np.round(v / 0.0625).astype(np.int64)  # quantize exact midpoints
    _, inv = np.unique(vq, axis=0, return_inverse=True)
    f = inv.reshape(-1, 3)
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    edges_undirected = np.sort(edges, axis=1)
    _, counts = np.unique(edges_undirected, axis=0, return_counts=True)
    assert np.all(counts == 2), np.unique(counts)
    # and orientation-consistent: each directed edge appears exactly once
    _, dcounts = np.unique(edges, axis=0, return_counts=True)
    assert np.all(dcounts == 1), np.unique(dcounts)

    # outward winding + volume close to the voxel volume
    vol = float(np.einsum("ij,ij->", tris[:, 0], np.cross(tris[:, 1], tris[:, 2])) / 6.0)
    want = mask.sum() * float(np.prod(spacing))
    assert vol > 0
    assert abs(vol - want) / want < 0.05, (vol, want)


def test_marching_tetrahedra_empty_and_full():
    from mamri_tpu.utils.scene import marching_tetrahedra_mesh

    sp = np.ones(3, np.float32)
    og = np.zeros(3, np.float32)
    assert marching_tetrahedra_mesh(np.zeros((8, 8, 8), bool), sp, og).shape == (0, 3, 3)
    # a fully-set volume still closes at the (padded) border
    tris = marching_tetrahedra_mesh(np.ones((6, 6, 6), bool), sp, og)
    vol = float(np.einsum("ij,ij->", tris[:, 0], np.cross(tris[:, 1], tris[:, 2])) / 6.0)
    assert abs(vol - 216.0) / 216.0 < 0.15


# ------------------------------------------------------------------ GLB
def test_write_glb_roundtrip(tmp_path):
    from mamri_tpu.utils.glb import read_glb, read_glb_summary, write_glb

    tris = capsule_mesh(20.0, 5.0, n_seg=8, n_rings=2)
    line = np.array([[0, 0, 0], [1, 1, 1], [2, 2, 2]], np.float32)
    path = str(tmp_path / "scene.glb")
    write_glb(
        path,
        [("PartA", tris), ("Empty", np.zeros((0, 3, 3), np.float32)), ("Body", tris * 2)],
        [("Trajectory", line), ("Short", line[:1])],
    )
    summary = read_glb_summary(path)  # validates accessor min/max vs payload
    assert summary["PartA"] == {"mode": 4, "count": 3 * len(tris)}
    assert summary["Body"] == {"mode": 4, "count": 3 * len(tris)}
    assert summary["Trajectory"] == {"mode": 3, "count": 3}
    assert "Empty" not in summary and "Short" not in summary

    gltf, bin_blob = read_glb(path)
    assert gltf["asset"]["version"] == "2.0"
    assert len(gltf["scenes"][0]["nodes"]) == 3
    # 4-byte alignment contract of the container
    assert len(bin_blob) % 4 == 0
    # materials: body translucent, parts opaque, colors distinct
    mats = {m["name"]: m for m in gltf["materials"]}
    assert mats["Body_mat"]["alphaMode"] == "BLEND"
    assert "alphaMode" not in mats["PartA_mat"]
    # exact payload round-trip for the triangle soup
    acc = gltf["accessors"][gltf["meshes"][0]["primitives"][0]["attributes"]["POSITION"]]
    view = gltf["bufferViews"][acc["bufferView"]]
    pts = np.frombuffer(
        bin_blob[view["byteOffset"] : view["byteOffset"] + view["byteLength"]], "<f4"
    ).reshape(-1, 3)
    np.testing.assert_array_equal(pts, tris.reshape(-1, 3))


def test_write_glb_empty_scene(tmp_path):
    from mamri_tpu.utils.glb import read_glb, write_glb

    path = str(tmp_path / "empty.glb")
    write_glb(path, [], [])
    gltf, bin_blob = read_glb(path)
    assert bin_blob == b""
    assert "nodes" not in gltf and "buffers" not in gltf


def test_export_scene_html_viewer(tmp_path):
    """The single-file interactive viewer embeds the full scene: every
    object present, quantized coordinates within 0.02 mm of the source
    geometry, and the WebGL boilerplate intact."""
    import numpy as np

    from mamri_tpu.utils.html_viewer import read_html_scene_summary, write_html_scene

    tri = np.array([[[0.0, 0.0, 0.0], [10.0, 0.0, 0.0], [0.0, 20.0, 0.0]],
                    [[0.0, 0.0, 5.0], [10.0, 0.0, 5.0], [0.0, 20.0, 5.0]]], np.float32)
    line = np.array([[0.0, 0.0, 0.0], [5.0, 5.0, 5.0], [9.0, 1.0, 2.0]], np.float32)
    p = str(tmp_path / "scene.html")
    n = write_html_scene(p, [("Part", tri)], [("Path", line)])
    assert n > 0
    with open(p) as f:
        html = f.read()
    assert "webgl" in html and "drawArrays" in html
    s = read_html_scene_summary(p)
    assert s["Part"]["kind"] == "mesh" and s["Part"]["verts"] == 6
    assert s["Path"]["kind"] == "line" and s["Path"]["verts"] == 3
    np.testing.assert_allclose(s["Part"]["bbox_lo"], [0, 0, 0], atol=0.02)
    np.testing.assert_allclose(s["Part"]["bbox_hi"], [10, 20, 5], atol=0.02)
    np.testing.assert_allclose(s["Path"]["bbox_hi"], [9, 5, 5], atol=0.02)


def test_engine_export_scene_html(tmp_path):
    """engine.export_scene('*.html') writes the full robot scene (all links +
    needle) into the viewer payload."""
    import numpy as np

    from mamri_tpu.api import MamriEngine
    from mamri_tpu.utils.html_viewer import read_html_scene_summary

    eng = MamriEngine()
    p = str(tmp_path / "robot.html")
    counts = eng.export_scene(p, include_body=False, include_trajectory=False)
    s = read_html_scene_summary(p)
    for spec in eng.model.specs:
        if spec.name == "Needle":
            continue
        assert spec.name in s and s[spec.name]["verts"] > 0, spec.name
    assert s["Needle"]["verts"] > 0
    # scene extents are robot-sized (the arm is ~440 mm tall, mounted +Z->+Y)
    hi = np.max([m["bbox_hi"] for m in s.values()], axis=0)
    lo = np.min([m["bbox_lo"] for m in s.values()], axis=0)
    assert (hi - lo).max() > 150.0


def test_export_trajectory_html_animation(tmp_path):
    """The animated viewer embeds link-local meshes + per-frame FK
    transforms; the round-trip transforms must equal fk_all_links over the
    path, and every link carries its link index."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mamri_tpu.api import MamriEngine
    from mamri_tpu.core.robot import fk_all_links
    from mamri_tpu.utils.html_viewer import read_html_scene_summary

    eng = MamriEngine()
    a0 = np.zeros(6, np.float32)
    a1 = np.array([0.4, -0.5, 0.3, 0.2, -0.3, 0.5], np.float32)
    eng.trajectory_path = np.linspace(a0, a1, 11).astype(np.float32)
    p = str(tmp_path / "traj.html")
    summary = eng.export_trajectory_html(p)
    assert summary["frames"] == 11
    s = read_html_scene_summary(p)
    anim = s["__anim__"]
    assert anim["frames"] == 11 and anim["links"] == len(eng.model.specs)
    assert anim["interval_ms"] == 50  # the reference's animation tick
    want = np.asarray(
        jax.vmap(lambda a: fk_all_links(eng.model, a, jnp.eye(4)))(
            jnp.asarray(eng.trajectory_path)
        )
    )
    np.testing.assert_allclose(anim["transforms"], want, atol=1e-5)
    for spec in eng.model.specs:
        if spec.name == "Needle":
            continue
        assert s[spec.name]["link"] == eng.model.link_index(spec.name)
    assert s["Needle"]["link"] == eng.model.link_index("Needle")
    assert s["TrajectoryTipPath"]["kind"] == "line" and s["TrajectoryTipPath"]["verts"] == 11


def test_mesh_readers_fuzz_fail_loudly(tmp_path):
    """STL and GLB readers under mutation fuzz (truncations + byte flips):
    parse or raise ValueError, never struct.error/KeyError/crash."""
    import warnings

    from mamri_tpu.utils.glb import read_glb, read_glb_summary, write_glb
    from mamri_tpu.utils.stl import load_stl, save_stl

    rng = np.random.default_rng(9)
    tris = rng.normal(0, 10, (20, 3, 3)).astype(np.float32)
    stl_p = str(tmp_path / "m.stl")
    glb_p = str(tmp_path / "s.glb")
    save_stl(stl_p, tris)
    write_glb(glb_p, [("part", tris)], [("traj", rng.normal(0, 10, (5, 3)).astype(np.float32))])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for raw, fuzz_path, readers in (
            (open(stl_p, "rb").read(), str(tmp_path / "f.stl"), (load_stl,)),
            (open(glb_p, "rb").read(), str(tmp_path / "f.glb"), (read_glb, read_glb_summary)),
        ):
            for _ in range(150):
                b = bytearray(raw)
                mode = rng.integers(0, 3)
                if mode == 0:
                    b = b[: int(rng.integers(1, len(b)))]
                elif mode == 1:
                    pos = int(rng.integers(0, len(b)))
                    b[pos] ^= int(rng.integers(1, 256))
                else:
                    for _k in range(8):
                        pos = int(rng.integers(0, len(b)))
                        b[pos] ^= int(rng.integers(1, 256))
                open(fuzz_path, "wb").write(bytes(b))
                for fn in readers:
                    try:
                        fn(fuzz_path)
                    except ValueError:
                        pass
