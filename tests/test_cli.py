"""CLI surface tests (python -m mamri_tpu) on small CPU volumes."""

import json

import numpy as np
import pytest

from mamri_tpu.__main__ import main
from mamri_tpu.perception.io import save_nifti
from mamri_tpu.perception.volume import synthetic_volume


@pytest.fixture(scope="module")
def scan_path(tmp_path_factory):
    """Small scene with only the baseplate triplet + a body blob."""
    pts = np.array([[-10.0, 20.0, 5.0], [10.0, 20.0, 5.0], [-10.0, -20.0, 5.0]], dtype=np.float32)
    v = synthetic_volume(
        shape=(64, 64, 64),
        fiducials_ras=pts,
        fiducial_radius_mm=3.0,
        body_center_ras=[0.0, 0.0, -18.0],
        body_radii_mm=[22.0, 20.0, 10.0],
    )
    p = str(tmp_path_factory.mktemp("cli") / "scan.nii.gz")
    save_nifti(p, v)
    return p


def test_cli_info(capsys):
    assert main(["info"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["articulated"] == ["Joint1", "Joint2", "Joint3", "Joint4", "Joint5", "Joint6"]
    assert out["motor_letters"] == ["A", "B", "C", "D", "E", "F"]


def test_cli_estimate_partial_scene(scan_path, capsys):
    """Baseplate-only scene: pose estimation fails gracefully (no Joint6)
    but reports the detected baseplate."""
    rc = main(["estimate", scan_path])
    out = json.loads(capsys.readouterr().out)
    assert rc == 1
    assert out["markers_found"]["Baseplate"] is True
    assert out["markers_found"]["Joint6"] is False
    assert "Joint6" in out["message"]


def test_cli_entry(scan_path, capsys):
    rc = main(["entry", scan_path, "--target", "0", "0", "-18"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0 and out["success"]
    assert out["distance_mm"] < 80.0


def test_cli_bad_volume(tmp_path, capsys):
    p = str(tmp_path / "bad.nii")
    with open(p, "wb") as f:
        f.write(b"garbage")
    with pytest.raises(SystemExit) as e:
        main(["estimate", p])
    assert e.value.code == 2
    out = json.loads(capsys.readouterr().out)
    assert not out["success"]


def test_cli_export_no_meshes(scan_path, tmp_path, capsys):
    rc = main(["export", scan_path, "--mesh-dir", str(tmp_path / "none"), "--out-dir", str(tmp_path / "out")])
    out = json.loads(capsys.readouterr().out)
    # partial scene: pose fails before export
    assert rc == 1
    assert not out["success"]


def test_cli_export_requires_an_output(scan_path, capsys):
    """`export` with no --out-dir/--scene/--render is rejected before any
    compute happens."""
    rc = main(["export", scan_path])
    out = json.loads(capsys.readouterr().out)
    assert rc == 2 and not out["success"]
    assert "--scene" in out["message"] and "--render" in out["message"]


def test_cli_convert_roundtrip(tmp_path, capsys):
    """convert: NIfTI -> JPEG-LS DICOM series -> Enhanced multi-frame ->
    NIfTI, bit-exact for integral data."""
    from mamri_tpu.perception.io import load_nifti
    from mamri_tpu.perception.volume import Volume

    rng = np.random.default_rng(2)
    v = Volume(data=rng.integers(0, 900, (12, 10, 6)).astype(np.float32),
               spacing=(1.0, 1.0, 2.0), origin=(1.0, -2.0, 3.0))
    src = str(tmp_path / "v.nii.gz")
    save_nifti(src, v)
    series = str(tmp_path / "series")
    assert main(["convert", src, series, "--transfer", "jpegls"]) == 0
    assert json.loads(capsys.readouterr().out)["files"] == 6
    mf = str(tmp_path / "mf" / "vol.dcm")
    assert main(["convert", series, mf, "--transfer", "rle"]) == 0
    assert json.loads(capsys.readouterr().out)["files"] == 1
    back = str(tmp_path / "back.nii.gz")
    assert main(["convert", str(tmp_path / "mf"), back]) == 0
    np.testing.assert_array_equal(np.asarray(load_nifti(back).data), v.data)


def test_cli_convert_nrrd_mha(tmp_path, capsys):
    """convert: DICOM series -> NRRD -> MetaImage -> NIfTI, values and
    geometry preserved through every hop."""
    from mamri_tpu.perception.dicom import save_dicom_series
    from mamri_tpu.perception.io import load_nifti
    from mamri_tpu.perception.volume import Volume

    rng = np.random.default_rng(3)
    v = Volume(data=rng.integers(0, 500, (8, 9, 5)).astype(np.float32),
               spacing=(1.0, 1.5, 2.0), origin=(-4.0, 1.0, 2.5))
    series = str(tmp_path / "series")
    save_dicom_series(series, v)
    nrrd = str(tmp_path / "v.nrrd")
    assert main(["convert", series, nrrd]) == 0
    assert json.loads(capsys.readouterr().out)["success"]
    mha = str(tmp_path / "v.mha")
    assert main(["convert", nrrd, mha]) == 0
    capsys.readouterr()
    back = str(tmp_path / "back.nii.gz")
    assert main(["convert", mha, back]) == 0
    out = load_nifti(back)
    np.testing.assert_array_equal(np.asarray(out.data), v.data)
    np.testing.assert_allclose(out.spacing, v.spacing, atol=1e-5)
    np.testing.assert_allclose(out.origin, v.origin, atol=1e-4)


def test_cli_export_seg_nrrd(scan_path, tmp_path, capsys):
    """export --seg writes a Slicer .seg.nrrd even when the pose itself is
    unavailable (segmentation precedes IK, as in the reference's process())."""
    seg = str(tmp_path / "auto.seg.nrrd")
    assert main(["export", scan_path, "--seg", seg]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["success"] and out["seg"] == seg
    from mamri_tpu.perception.formats import load_nrrd

    lm = load_nrrd(seg)
    assert lm.data.max() == 1.0  # one Body segment
    head = open(seg, "rb").read(4096).split(b"\n\n")[0].decode()
    assert "Segment0_Name:=Body" in head


def test_cli_export_seg_with_pose_outputs_fails_cleanly(scan_path, tmp_path, capsys):
    """--seg + a pose-dependent output on a pose-less scan: the seg is still
    written, the command reports the pose failure and exits 1."""
    seg = str(tmp_path / "s.seg.nrrd")
    scene = str(tmp_path / "s.obj")
    assert main(["export", scan_path, "--seg", seg, "--scene", scene]) == 1
    out = json.loads(capsys.readouterr().out)
    assert not out["success"] and out["seg"] == seg
    import os

    assert os.path.exists(seg)


def test_cli_hw_simulator_closed_loop(tmp_path, capsys):
    """hw --sim: full closed loop against the protocol simulator — status,
    absolute move (degrees), trajectory exec from a plan .npz, jog, homing,
    and counter zeroing, each through the real 150 ms-style runner."""
    assert main(["hw", "status", "--sim"]) == 0
    st = json.loads(capsys.readouterr().out)
    assert st["success"] and st["status"]["encoder_steps"] is not None
    assert st["joints"][0][0] == "Joint"

    assert main(["hw", "move", "--sim", "--degrees", "5", "-3", "2", "0", "1", "0",
                 "--tick", "0.01"]) == 0
    mv = json.loads(capsys.readouterr().out)
    assert mv["outcome"] == "SUCCESS"
    assert mv["final_status"]["encoder_steps"] == mv["final_status"]["controller_steps"]

    plan = str(tmp_path / "plan.npz")
    kf = np.deg2rad(np.array([[2.0, -1.0, 1.0, 0.0, 0.5, 0.0],
                              [4.0, -2.0, 2.0, 0.0, 1.0, 0.0]], dtype=np.float32))
    np.savez(plan, keyframes=kf)
    assert main(["hw", "exec", "--sim", "--plan", plan, "--tick", "0.01"]) == 0
    ex = json.loads(capsys.readouterr().out)
    assert ex["outcome"] == "SUCCESS"

    assert main(["hw", "jog", "--sim", "--joint", "2", "--delta", "40", "--tick", "0.01"]) == 0
    assert json.loads(capsys.readouterr().out)["outcome"] == "SUCCESS"

    assert main(["hw", "zero", "--sim", "--tick", "0.01", "--sync"]) == 0
    z = json.loads(capsys.readouterr().out)
    assert z["outcome"] == "SUCCESS"
    assert z["final_status"]["encoder_steps"] == [0] * 6

    assert main(["hw", "zero-hardware", "--sim"]) == 0
    assert json.loads(capsys.readouterr().out)["success"]


def test_cli_hw_argument_errors(capsys):
    assert main(["hw", "status"]) == 2  # neither --sim nor --ports
    assert not json.loads(capsys.readouterr().out)["success"]
    assert main(["hw", "move", "--sim"]) == 2  # no --steps/--degrees
    assert not json.loads(capsys.readouterr().out)["success"]


def test_cli_demo_end_to_end(tmp_path, capsys):
    """demo: synthetic scene -> estimate -> entry -> plan -> artifacts ->
    simulated execution, with no input data. Coarse spacing keeps it fast."""
    import os

    out_dir = str(tmp_path / "demo")
    rc = main(["demo", "--out-dir", out_dir, "--spacing", "6.0", "--execute"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0, out
    assert out["success"] and out["plan_success"]
    est = np.asarray(out["angles_deg"])
    true = np.asarray(out["true_angles_deg"])
    assert abs(est[0] - true[0]) < 2.0  # J1 directly observed by markers
    for name in ("scan.nrrd", "body.seg.nrrd", "plan.npz", "scene.html"):
        assert os.path.exists(os.path.join(out_dir, name)), name
    assert out["executed"] == "SUCCESS"
    np.testing.assert_array_equal(
        out["final_steps"], np.load(os.path.join(out_dir, "plan.npz"))["goal_steps"]
    )


def test_cli_hw_exec_rejects_bad_plan(tmp_path, capsys):
    """Plan validation happens BEFORE any hardware is touched: a .npz
    without 'keyframes' is a structured error, not a traceback."""
    bad = str(tmp_path / "notaplan.npz")
    np.savez(bad, path=np.zeros((3, 6)))
    assert main(["hw", "exec", "--sim", "--plan", bad]) == 2
    out = json.loads(capsys.readouterr().out)
    assert not out["success"] and "keyframes" in out["message"]
    assert main(["hw", "exec", "--sim", "--plan", str(tmp_path / "missing.npz")]) == 2
    assert not json.loads(capsys.readouterr().out)["success"]
