import os

import numpy as np
import pytest

from mamri_tpu.perception.io import load_nifti, save_nifti
from mamri_tpu.perception.volume import synthetic_volume


def test_nifti_roundtrip(tmp_path):
    v = synthetic_volume(shape=(24, 32, 20), spacing=(1.0, 1.5, 2.0),
                         fiducials_ras=np.array([[0.0, 0.0, 0.0]]))
    for name in ("vol.nii", "vol.nii.gz"):
        p = str(tmp_path / name)
        save_nifti(p, v)
        back = load_nifti(p)
        np.testing.assert_allclose(back.data, v.data, atol=0)
        np.testing.assert_allclose(back.spacing, v.spacing, atol=1e-6)
        np.testing.assert_allclose(back.origin, v.origin, atol=1e-4)


def test_nifti_rejects_garbage(tmp_path):
    p = str(tmp_path / "junk.nii")
    with open(p, "wb") as f:
        f.write(b"not a nifti at all" * 40)
    with pytest.raises(ValueError):
        load_nifti(p)


def test_nifti_negative_z_flip(tmp_path):
    """A file with negative z step loads flipped into positive-step LPS."""
    import struct, gzip
    v = synthetic_volume(shape=(8, 8, 6), spacing=(1.0, 1.0, 1.0))
    v.data[:, :, 0] = 99.0  # marker plane at k=0
    p = str(tmp_path / "neg.nii")
    save_nifti(p, v)
    raw = bytearray(open(p, "rb").read())
    # rewrite srow z: step -1, origin at far end
    z_far = float(v.origin[2] + (v.shape[2] - 1))
    struct.pack_into("<4f", raw, 312, 0.0, 0.0, -1.0, z_far)
    # reverse the data along z to keep the same physical scene
    data = np.frombuffer(bytes(raw[352:]), dtype=np.float32).reshape(v.shape, order="F")
    data = np.flip(data, axis=2)
    raw[352:] = data.tobytes(order="F")
    open(p, "wb").write(bytes(raw))
    back = load_nifti(p)
    assert back.spacing[2] > 0
    np.testing.assert_allclose(back.data, v.data, atol=0)
    np.testing.assert_allclose(back.origin, v.origin, atol=1e-4)


def test_oblique_nifti_resamples(tmp_path):
    """An obliquely-rotated sform must resample, preserving world-space
    structure (a sphere's centroid) instead of raising (VERDICT r1 #4)."""
    import struct

    v = synthetic_volume(shape=(40, 40, 40), fiducials_ras=np.array([[3.0, -4.0, 5.0]]),
                         fiducial_radius_mm=4.0)
    p = str(tmp_path / "obl.nii")
    save_nifti(p, v)
    raw = bytearray(open(p, "rb").read())
    # rotate the (axis-aligned LPS->RAS) affine by 10 deg about z, RAS space
    th = np.radians(10.0)
    R = np.array([[np.cos(th), -np.sin(th), 0.0], [np.sin(th), np.cos(th), 0.0], [0.0, 0.0, 1.0]])
    srow = np.array(struct.unpack_from("<12f", raw, 280)).reshape(3, 4)
    new = np.zeros((3, 4))
    new[:, :3] = R @ srow[:, :3]
    new[:, 3] = R @ srow[:, 3]
    struct.pack_into("<12f", raw, 280, *new.reshape(-1).tolist())
    open(p, "wb").write(bytes(raw))

    back = load_nifti(p)
    # sphere centroid in the resampled grid must sit at the rotated position
    target_ras = R @ np.array([3.0, -4.0, 5.0])
    target_lps = target_ras * np.array([-1.0, -1.0, 1.0])
    w = np.asarray(back.data) > 100.0
    idx = np.argwhere(w)
    centroid_lps = back.origin + back.spacing * idx.mean(axis=0)
    assert np.linalg.norm(centroid_lps - target_lps) < 1.0, (centroid_lps, target_lps)


def test_permuted_affine_normalizes_exactly():
    from mamri_tpu.perception.io import volume_from_affine

    v = synthetic_volume(shape=(10, 12, 14), fiducials_ras=np.array([[0.0, 0.0, 0.0]]))
    # store data as (z, x, y) with a flip on x: index axes drive LPS (1,2,0)
    data_perm = np.flip(np.transpose(v.data, (2, 0, 1)), axis=1)
    aff = np.zeros((3, 4))
    # index 0 (old z) -> LPS z; index 1 (old x, flipped) -> LPS x; index 2 -> y
    aff[2, 0] = v.spacing[2]
    aff[0, 1] = -v.spacing[0]
    aff[1, 2] = v.spacing[1]
    aff[:, 3] = v.origin + np.array([v.spacing[0] * (v.shape[0] - 1), 0.0, 0.0])
    back = volume_from_affine(data_perm, aff)
    np.testing.assert_array_equal(back.data, v.data)
    np.testing.assert_allclose(back.spacing, v.spacing, atol=1e-6)
    np.testing.assert_allclose(back.origin, v.origin, atol=1e-5)


def test_dicom_series_roundtrip(tmp_path):
    from mamri_tpu.perception.dicom import load_dicom_series, save_dicom_series

    v = synthetic_volume(shape=(24, 32, 20), spacing=(1.0, 1.5, 2.0),
                         fiducials_ras=np.array([[0.0, 0.0, 0.0]]))
    d = str(tmp_path / "series")
    paths = save_dicom_series(d, v)
    assert len(paths) == 20
    back = load_dicom_series(d)
    assert back.data.shape == v.data.shape
    np.testing.assert_allclose(back.spacing, v.spacing, atol=1e-5)
    np.testing.assert_allclose(back.origin, v.origin, atol=1e-3)
    # int16 + rescale quantization
    assert np.abs(back.data - v.data).max() < 0.01 * (v.data.max() - v.data.min())


def test_dicom_integral_data_roundtrips_exactly(tmp_path):
    """Integer-valued volumes (all real CT/MR intensities) must store at
    rescale slope 1 and round-trip BIT-exactly; non-integral data keeps the
    quantizing 64767-step rescale."""
    from mamri_tpu.perception.dicom import load_dicom_series, save_dicom_series
    from mamri_tpu.perception.volume import Volume

    rng = np.random.default_rng(11)
    data = rng.integers(-1000, 3000, (20, 18, 6)).astype(np.float32)
    v = Volume(data=data, spacing=(1.0, 1.0, 2.0), origin=(0.0, 0.0, 0.0))
    for transfer in ("explicit_le", "rle", "jpegll"):
        d = str(tmp_path / transfer)
        save_dicom_series(d, v, transfer=transfer)
        back = load_dicom_series(d)
        np.testing.assert_array_equal(back.data, data)
        # int16-representable integral data stores at identity rescale, so
        # the loader keeps the compact scanner dtype
        assert back.data.dtype == np.int16, transfer
    frac = data + 0.5
    d = str(tmp_path / "frac")
    save_dicom_series(d, Volume(data=frac, spacing=v.spacing, origin=v.origin))
    back = load_dicom_series(d).data
    assert np.abs(np.asarray(back) - frac).max() < 0.5  # quantized, close
    # huge-range integral data falls back to the quantizing rescale
    wide = np.zeros((4, 4, 2), np.float32); wide[0, 0, 0] = 1e6
    d = str(tmp_path / "wide")
    save_dicom_series(d, Volume(data=wide, spacing=v.spacing, origin=v.origin))
    # half a quantization step: 1e6/64767/2 ~ 7.8 (65000-step grid would clip)
    assert float(np.abs(np.asarray(load_dicom_series(d).data) - wide).max()) < 8.0


def test_dicom_series_unsorted_and_multi(tmp_path):
    """Slices shuffled on disk and a second decoy series: geometric sort +
    largest-series selection must reassemble the right volume."""
    import os
    from mamri_tpu.perception.dicom import load_dicom_series, save_dicom_series

    v = synthetic_volume(shape=(16, 16, 12), fiducials_ras=np.array([[0.0, 0.0, 0.0]]))
    d = str(tmp_path / "series")
    paths = save_dicom_series(d, v, series_number=7)
    # shuffle filenames so lexical order != slice order
    rng = np.random.default_rng(0)
    names = [os.path.basename(p) for p in paths]
    perm = rng.permutation(len(names))
    for p, q in zip(names, [f"tmp_{i}.dcm" for i in range(len(names))]):
        os.rename(os.path.join(d, p), os.path.join(d, q))
    for i, j in enumerate(perm):
        os.rename(os.path.join(d, f"tmp_{i}.dcm"), os.path.join(d, names[j]))
    # decoy smaller series in the same directory
    decoy = synthetic_volume(shape=(8, 8, 4))
    for i, p in enumerate(save_dicom_series(str(tmp_path / "decoy"), decoy, series_number=9)):
        os.rename(p, os.path.join(d, f"decoy_{i}.dcm"))
    # non-DICOM junk too
    with open(os.path.join(d, "notes.txt"), "w") as f:
        f.write("not dicom")

    back = load_dicom_series(d)
    assert back.data.shape == v.data.shape
    np.testing.assert_allclose(back.origin, v.origin, atol=1e-3)
    # center sphere present
    assert (np.abs(back.data - v.data).max()) < 0.01 * (v.data.max() - v.data.min())


def test_dicom_oblique_series_resamples(tmp_path):
    """Oblique IOP/IPP series resample onto an axis-aligned LPS grid with the
    sphere centroid preserved in world space."""
    import struct as _s
    from mamri_tpu.perception.dicom import load_dicom_series, save_dicom_series, _ds, _el

    v = synthetic_volume(shape=(32, 32, 24), fiducials_ras=np.array([[2.0, 1.0, -3.0]]),
                         fiducial_radius_mm=4.0)
    d = str(tmp_path / "obl")
    save_dicom_series(d, v)
    # rewrite IOP/IPP of each slice with a 12-deg rotation about LPS z
    import os
    th = np.radians(12.0)
    R = np.array([[np.cos(th), -np.sin(th), 0.0], [np.sin(th), np.cos(th), 0.0], [0.0, 0.0, 1.0]])
    row_dir = R @ np.array([1.0, 0.0, 0.0])
    col_dir = R @ np.array([0.0, 1.0, 0.0])
    for k, name in enumerate(sorted(os.listdir(d))):
        p = os.path.join(d, name)
        raw = open(p, "rb").read()
        ipp = R @ (np.asarray(v.origin, dtype=np.float64) + [0.0, 0.0, float(v.spacing[2]) * k])
        new_ipp = _el(0x0020, 0x0032, b"DS", _ds(ipp))
        new_iop = _el(0x0020, 0x0037, b"DS", _ds(np.concatenate([row_dir, col_dir])))
        # replace the fixed-size original elements by scanning for their tags
        def _replace(buf, group, elem, new):
            tagb = _s.pack("<HH", group, elem)
            i = buf.index(tagb + b"DS")
            ln = _s.unpack_from("<H", buf, i + 6)[0]
            return buf[:i] + new + buf[i + 8 + ln:]
        raw = _replace(raw, 0x0020, 0x0032, new_ipp)
        raw = _replace(raw, 0x0020, 0x0037, new_iop)
        open(p, "wb").write(raw)

    back = load_dicom_series(d)
    target_lps = R @ (np.array([2.0, 1.0, -3.0]) * np.array([-1.0, -1.0, 1.0]))
    w = np.asarray(back.data) > 100.0
    assert w.any()
    idx = np.argwhere(w)
    centroid_lps = back.origin + back.spacing * idx.mean(axis=0)
    assert np.linalg.norm(centroid_lps - target_lps) < 1.0, (centroid_lps, target_lps)


def test_dicom_series_to_pose_end_to_end(tmp_path):
    """BASELINE config 2: a DICOM series straight into estimate_pose — the
    reference's Add-DICOM-Data -> Start-Pose-Estimation workflow
    (Mamri/Mamri.py:1306 via Slicer's DICOM ingest)."""
    import jax.numpy as jnp

    from mamri_tpu.api import MamriEngine
    from mamri_tpu.core import transforms as T
    from mamri_tpu.core.robot import marker_world_positions
    from mamri_tpu.perception.dicom import load_dicom_series, save_dicom_series
    from mamri_tpu.perception.volume import synthetic_volume

    eng = MamriEngine(ik_iters=60, ik_restarts=6)
    true_angles = np.array([0.3, -0.7, 0.5, 0.2, -0.4, 0.6], dtype=np.float32)
    base = np.asarray(
        T.translate(jnp.asarray(np.array([-60.0, -120.0, 0.0], np.float32)))
        @ T.rot_x(jnp.float32(-np.pi / 2))
        @ T.rot_z(jnp.float32(0.15))
    )
    pts = np.concatenate(
        [
            np.asarray(marker_world_positions(eng.model, jnp.asarray(true_angles), ln, jnp.asarray(base)))
            for ln in ["Baseplate", "Joint2", "Joint4", "Joint6"]
        ]
    )
    lo, hi = pts.min(0) - 40, pts.max(0) + 40
    body_center = [-60.0, -40.0, 130.0]
    lo = np.minimum(lo, np.array(body_center) - 70)
    hi = np.maximum(hi, np.array(body_center) + 70)
    sp = np.full(3, 2.5, np.float32)
    lps_lo = np.array([-hi[0], -hi[1], lo[2]], np.float32)
    lps_hi = np.array([-lo[0], -lo[1], hi[2]], np.float32)
    shape = tuple(int(np.ceil(e)) for e in (lps_hi - lps_lo) / sp)
    vol = synthetic_volume(
        shape=shape,
        spacing=sp,
        origin=lps_lo,
        fiducials_ras=pts,
        fiducial_radius_mm=4.0,
        body_center_ras=body_center,
        body_radii_mm=[45.0, 55.0, 65.0],
    )

    d = str(tmp_path / "series")
    os.makedirs(d)
    save_dicom_series(d, vol)
    loaded = load_dicom_series(d)
    np.testing.assert_allclose(np.asarray(loaded.spacing), sp, atol=1e-4)

    res = eng.estimate_pose(loaded)
    assert res.success, res.message
    err_deg = np.rad2deg(np.abs(res.angles_rad - true_angles))
    assert err_deg.max() < 1.0, err_deg


def test_dicom_rle_roundtrip(tmp_path):
    """RLE Lossless (PS3.5 annex G PackBits) must round-trip BIT-exactly with
    the uncompressed writer output — real scanner exports are frequently
    RLE/JPEG compressed; RLE is the dependency-free lossless one."""
    from mamri_tpu.perception.dicom import load_dicom_series, save_dicom_series

    v = synthetic_volume(shape=(24, 32, 12), spacing=(1.0, 1.5, 2.0),
                         fiducials_ras=np.array([[0.0, 0.0, 0.0]]))
    d_rle = str(tmp_path / "rle")
    d_raw = str(tmp_path / "raw")
    paths = save_dicom_series(d_rle, v, transfer="rle")
    save_dicom_series(d_raw, v)
    assert len(paths) == 12
    back_rle = load_dicom_series(d_rle)
    back_raw = load_dicom_series(d_raw)
    np.testing.assert_array_equal(back_rle.data, back_raw.data)  # lossless codec
    np.testing.assert_allclose(back_rle.spacing, v.spacing, atol=1e-5)
    np.testing.assert_allclose(back_rle.origin, v.origin, atol=1e-3)
    # the constant background must actually compress (runs -> replicates)
    import os

    raw_size = sum(os.path.getsize(os.path.join(d_raw, f)) for f in os.listdir(d_raw))
    rle_size = sum(os.path.getsize(os.path.join(d_rle, f)) for f in os.listdir(d_rle))
    assert rle_size < raw_size


def test_packbits_codec_property():
    """encode -> decode identity on adversarial byte patterns (long runs,
    literals, alternations, 128-boundary lengths)."""
    from mamri_tpu.perception.dicom import _packbits_decode, _packbits_encode

    rng = np.random.default_rng(17)
    cases = [
        b"", b"\x00", b"\x00" * 3, b"\xff" * 500, bytes(range(256)),
        b"ab" * 200, b"\x01" * 128 + b"\x02" * 129 + bytes(range(64)),
        rng.integers(0, 256, 1000).astype(np.uint8).tobytes(),
        rng.integers(0, 3, 4096).astype(np.uint8).tobytes(),
    ]
    for seg in cases:
        enc = _packbits_encode(seg)
        assert _packbits_decode(enc, len(seg)) == seg


def test_dicom_explicit_big_endian(tmp_path):
    """A hand-built Explicit VR Big Endian slice must load with correctly
    byte-swapped headers and pixels."""
    import os
    import struct

    from mamri_tpu.perception.dicom import _EXPLICIT_BE, _MR_STORAGE, _el, load_dicom_series

    rows, cols = 8, 6
    arr = (np.arange(rows * cols, dtype=np.int16) - 10).reshape(rows, cols)

    def el_be(group, elem, vr, value):
        if len(value) % 2:
            value += b"\x00" if vr in (b"OB", b"OW", b"UI") else b" "
        if vr in (b"OB", b"OW"):
            return struct.pack(">HH", group, elem) + vr + struct.pack(">HI", 0, len(value)) + value
        return struct.pack(">HH", group, elem) + vr + struct.pack(">H", len(value)) + value

    body = b"".join([
        el_be(0x0020, 0x000E, b"UI", b"1.2.3.4"),
        el_be(0x0020, 0x0032, b"DS", b"0\\0\\0"),
        el_be(0x0020, 0x0037, b"DS", b"1\\0\\0\\0\\1\\0"),
        el_be(0x0028, 0x0010, b"US", struct.pack(">H", rows)),
        el_be(0x0028, 0x0011, b"US", struct.pack(">H", cols)),
        el_be(0x0028, 0x0030, b"DS", b"1\\1"),
        el_be(0x0028, 0x0100, b"US", struct.pack(">H", 16)),
        el_be(0x0028, 0x0103, b"US", struct.pack(">H", 1)),
        el_be(0x7FE0, 0x0010, b"OW", arr.astype(">i2").tobytes()),
    ])
    meta_body = b"".join([
        _el(0x0002, 0x0002, b"UI", _MR_STORAGE.encode()),
        _el(0x0002, 0x0003, b"UI", b"1.2.3.4.1"),
        _el(0x0002, 0x0010, b"UI", _EXPLICIT_BE.encode()),
    ])
    meta = _el(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_body))) + meta_body
    d = str(tmp_path / "be")
    os.makedirs(d)
    with open(os.path.join(d, "s0.dcm"), "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body)

    vol = load_dicom_series(d)
    assert vol.data.shape == (cols, rows, 1)
    np.testing.assert_array_equal(vol.data[:, :, 0], arr.T.astype(np.float32))


def test_dicom_jpeg_lossless_roundtrip(tmp_path):
    """JPEG Lossless SV1 (1.2.840.10008.1.2.4.70) must round-trip BIT-exactly
    with the uncompressed writer output — the other common lossless scanner
    export besides RLE (the reference ingests it via Slicer's DICOM stack,
    Mamri.py:1306)."""
    from mamri_tpu.perception.dicom import load_dicom_series, save_dicom_series

    v = synthetic_volume(shape=(24, 32, 12), spacing=(1.0, 1.5, 2.0),
                         fiducials_ras=np.array([[0.0, 0.0, 0.0]]))
    d_jll = str(tmp_path / "jll")
    d_raw = str(tmp_path / "raw")
    paths = save_dicom_series(d_jll, v, transfer="jpegll")
    save_dicom_series(d_raw, v)
    assert len(paths) == 12
    back_jll = load_dicom_series(d_jll)
    back_raw = load_dicom_series(d_raw)
    np.testing.assert_array_equal(back_jll.data, back_raw.data)  # lossless codec
    np.testing.assert_allclose(back_jll.spacing, v.spacing, atol=1e-5)
    np.testing.assert_allclose(back_jll.origin, v.origin, atol=1e-3)
    # the smooth phantom must actually compress
    import os

    raw_size = sum(os.path.getsize(os.path.join(d_raw, f)) for f in os.listdir(d_raw))
    jll_size = sum(os.path.getsize(os.path.join(d_jll, f)) for f in os.listdir(d_jll))
    assert jll_size < raw_size


def test_jpegll_codec_property():
    """Property sweep of the T.81 process-14 codec itself: every predictor,
    restart intervals, point transform, 8/12/16-bit precisions, and
    native/python decoder agreement (the Python decoder is the oracle)."""
    from mamri_tpu import native
    from mamri_tpu.perception import jpegll

    rng = np.random.default_rng(7)
    base = rng.integers(0, 500, (61, 45)).astype(np.int64)
    smooth = (np.cumsum(np.cumsum(base, 0), 1) % 65536).astype(np.uint16)
    images = [
        smooth,
        rng.integers(0, 65536, (33, 40)).astype(np.uint16),  # all categories
        np.full((17, 19), 4242, np.uint16),  # single-symbol Huffman table
        rng.integers(0, 256, (28, 31)).astype(np.uint16),  # 8-bit range
    ]
    for img in images:
        for predictor in range(1, 8):
            enc = jpegll.encode_jpeg_lossless(img, 16, predictor=predictor)
            dec, prec = jpegll.decode_jpeg_lossless(enc, use_native=False)
            assert prec == 16
            np.testing.assert_array_equal(dec, img)
            if native.available():
                dn, pn = native.jpegll_decode_native(enc)
                assert pn == 16
                np.testing.assert_array_equal(dn, img)
    # restart intervals (non-divisible final band) + point transform + 12-bit
    enc = jpegll.encode_jpeg_lossless(smooth, 16, predictor=4, restart_rows=13)
    np.testing.assert_array_equal(
        jpegll.decode_jpeg_lossless(enc, use_native=False)[0], smooth
    )
    if native.available():
        np.testing.assert_array_equal(native.jpegll_decode_native(enc)[0], smooth)
    twelve = rng.integers(0, 4096, (22, 26)).astype(np.uint16)
    enc = jpegll.encode_jpeg_lossless(twelve, 12)
    np.testing.assert_array_equal(
        jpegll.decode_jpeg_lossless(enc, use_native=False)[0], twelve
    )
    shifted = (rng.integers(0, 2048, (20, 24)).astype(np.uint16) << 2)
    enc = jpegll.encode_jpeg_lossless(shifted, 16, pt=2)
    np.testing.assert_array_equal(
        jpegll.decode_jpeg_lossless(enc, use_native=False)[0], shifted
    )
    # malformed streams fail loudly, not silently
    import pytest

    with pytest.raises(ValueError):
        jpegll.decode_jpeg_lossless(b"\xff\xd8\xff\xd9", use_native=False)
    truncated = jpegll.encode_jpeg_lossless(smooth, 16)[:-40]
    with pytest.raises(ValueError):
        jpegll.decode_jpeg_lossless(truncated, use_native=False)


def test_dicom_enhanced_multiframe_roundtrip(tmp_path):
    """Enhanced MR single-file multi-frame exports (per-frame PlanePosition +
    shared PlaneOrientation/PixelMeasures/PixelValueTransformation functional
    groups, PS3.3 C.7.6.16 — geometry deliberately absent at top level)
    assemble identically to the one-file-per-slice series, for every
    supported transfer syntax."""
    from mamri_tpu.perception.dicom import load_dicom_series, save_dicom_multiframe
    from mamri_tpu.perception.volume import Volume

    rng = np.random.default_rng(5)
    data = rng.integers(-200, 2000, (14, 12, 9)).astype(np.float32)
    v = Volume(data=data, spacing=(0.8, 1.25, 2.5), origin=(-10.0, 4.0, 7.5))
    for transfer in ("explicit_le", "rle", "jpegll"):
        d = tmp_path / transfer
        save_dicom_multiframe(str(d / "vol.dcm"), v, transfer=transfer)
        back = load_dicom_series(str(d))
        np.testing.assert_array_equal(back.data, data)  # integral -> bit-exact
        np.testing.assert_allclose(back.spacing, v.spacing, atol=1e-6)
        np.testing.assert_allclose(back.origin, v.origin, atol=1e-5)


def test_dicom_multiframe_implicit_vr_and_classic(tmp_path):
    """Hand-packed implicit VR multi-frame files — the wire forms no explicit
    writer produces: (a) an Enhanced file whose functional groups are
    implicit-VR sequences mixing defined/undefined sequence lengths and an
    undefined-length item; (b) a classic multi-frame file (top-level
    geometry, NumberOfFrames, SpacingBetweenSlices along the IOP normal)."""
    import struct

    from mamri_tpu.perception.dicom import load_dicom_series

    rng = np.random.default_rng(9)
    rows, cols, nf = 6, 5, 3
    frames = rng.integers(0, 3000, (nf, rows, cols)).astype(np.uint16)

    def imp(g, e, v):
        if len(v) % 2:
            v += b" "
        return struct.pack("<HHI", g, e, len(v)) + v

    def item(content):
        return struct.pack("<HHI", 0xFFFE, 0xE000, len(content)) + content

    def item_undef(content):
        return (struct.pack("<HHI", 0xFFFE, 0xE000, 0xFFFFFFFF) + content
                + struct.pack("<HHI", 0xFFFE, 0xE00D, 0))

    def sq(g, e, items_bytes):
        return imp(g, e, b"".join(items_bytes))

    def sq_undef(g, e, items_bytes):
        return (struct.pack("<HHI", g, e, 0xFFFFFFFF) + b"".join(items_bytes)
                + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0))

    def common(uid):
        return (
            imp(0x0020, 0x000E, uid)
            + imp(0x0028, 0x0008, str(nf).encode())
            + imp(0x0028, 0x0010, struct.pack("<H", rows))
            + imp(0x0028, 0x0011, struct.pack("<H", cols))
            + imp(0x0028, 0x0100, struct.pack("<H", 16))
            + imp(0x0028, 0x0103, struct.pack("<H", 0))
        )

    pix = imp(0x7FE0, 0x0010, frames.tobytes())

    shared_item = (
        sq(0x0020, 0x9116, [item(imp(0x0020, 0x0037, b"1\\0\\0\\0\\1\\0"))])
        + sq(0x0028, 0x9110,
             [item_undef(imp(0x0018, 0x0088, b"2.5")
                         + imp(0x0028, 0x0030, b"1.5\\1.25"))])
    )
    perframe = [
        item(
            sq_undef(0x0020, 0x9113,
                     [item(imp(0x0020, 0x0032, f"3\\-4\\{7 + 2.5 * k:g}".encode()))])
            # vendor-style per-frame rescale: value = stored*2 + 1000k
            + sq(0x0028, 0x9145,
                 [item(imp(0x0028, 0x1052, f"{1000 * k}".encode())
                       + imp(0x0028, 0x1053, b"2"))])
        )
        for k in range(nf)
    ]
    enhanced = (
        common(b"1.2.3.4")
        + sq(0x5200, 0x9229, [item_undef(shared_item)])
        + sq_undef(0x5200, 0x9230, perframe)
        + pix
    )
    d1 = tmp_path / "enhanced"
    d1.mkdir()
    (d1 / "f.dcm").write_bytes(enhanced)
    vol = load_dicom_series(str(d1))
    assert vol.data.shape == (cols, rows, nf)
    np.testing.assert_allclose(vol.spacing, (1.25, 1.5, 2.5), atol=1e-6)
    np.testing.assert_allclose(vol.origin, (3.0, -4.0, 7.0), atol=1e-6)
    for k in range(nf):
        np.testing.assert_array_equal(
            vol.data[:, :, k], frames[k].T.astype(np.float32) * 2.0 + 1000.0 * k
        )

    # classic: spacing from SliceThickness (no SpacingBetweenSlices present)
    classic = (
        imp(0x0018, 0x0050, b"2")
        + common(b"9.8.7")
        + imp(0x0020, 0x0032, b"0\\0\\5")
        + imp(0x0020, 0x0037, b"1\\0\\0\\0\\1\\0")
        + imp(0x0028, 0x0030, b"1\\1")
        + pix
    )
    d2 = tmp_path / "classic"
    d2.mkdir()
    (d2 / "f.dcm").write_bytes(classic)
    vol2 = load_dicom_series(str(d2))
    assert vol2.data.shape == (cols, rows, nf)
    np.testing.assert_allclose(vol2.spacing, (1.0, 1.0, 2.0), atol=1e-6)
    np.testing.assert_allclose(vol2.origin, (0.0, 0.0, 5.0), atol=1e-6)
    for k in range(nf):
        np.testing.assert_array_equal(vol2.data[:, :, k], frames[k].T.astype(np.float32))

    # a multi-frame file with neither per-frame positions nor any slice
    # spacing must fail LOUDLY, not silently default to 1 mm
    no_spacing = (
        common(b"6.6.6")
        + imp(0x0020, 0x0032, b"0\\0\\5")
        + imp(0x0020, 0x0037, b"1\\0\\0\\0\\1\\0")
        + imp(0x0028, 0x0030, b"1\\1")
        + pix
    )
    d3 = tmp_path / "nospacing"
    d3.mkdir()
    (d3 / "f.dcm").write_bytes(no_spacing)
    with pytest.raises(ValueError, match="slice spacing"):
        load_dicom_series(str(d3))


def test_jpegll_app_com_segments_and_malformed_dht():
    """(a) APPn/COM segments BEFORE SOF3 — including payloads containing the
    FF C3 byte pair — must not fool either decoder's marker walk (a raw
    find() prescan once did). (b) A DHT defining an out-of-range SSSS symbol
    (>16) must fail loudly in both decoders, never shift-UB."""
    import struct

    import pytest

    from mamri_tpu import native
    from mamri_tpu.perception import jpegll

    rng = np.random.default_rng(21)
    img = rng.integers(0, 4096, (19, 23)).astype(np.uint16)
    enc = jpegll.encode_jpeg_lossless(img, 16)
    assert enc[:2] == b"\xff\xd8"
    payload = b"decoy \xff\xc3" + struct.pack(">BHHB", 16, 60000, 60000, 1)
    com = struct.pack(">HH", 0xFFFE, len(payload) + 2) + payload
    app1 = struct.pack(">HH", 0xFFE1, 8) + b"Exif\x00\x00"
    doctored = enc[:2] + app1 + com + enc[2:]
    dec, prec = jpegll.decode_jpeg_lossless(doctored, use_native=False)
    assert prec == 16
    np.testing.assert_array_equal(dec, img)
    if native.available():
        dn, pn = native.jpegll_decode_native(doctored)
        assert pn == 16
        np.testing.assert_array_equal(dn, img)

    # DHT with symbol 0xFF: counts say one 1-bit code, symbol value 255
    bad_dht = struct.pack(">HH", 0xFFC4, 2 + 17 + 1) + bytes([0, 1] + [0] * 15 + [255])
    sof = struct.pack(">HH", 0xFFC3, 11) + struct.pack(">BHHB", 16, 2, 2, 1) + bytes([1, 0x11, 0])
    sos = struct.pack(">HH", 0xFFDA, 8) + bytes([1, 1, 0x00, 1, 0, 0])
    bad = b"\xff\xd8" + sof + bad_dht + sos + b"\x00\x00\x00\x00" + b"\xff\xd9"
    with pytest.raises(ValueError):
        jpegll.decode_jpeg_lossless(bad, use_native=False)
    if native.available():
        with pytest.raises(ValueError):
            native.jpegll_decode_native(bad)


def test_jpegll_corrupt_streams_fail_loudly():
    """Byte-flip fuzz over a valid JPEG Lossless stream (same contract as the
    JPEG-LS/DCT/2000 fuzz): both decoders either decode — agreeing with each
    other — or raise ValueError; never crash, never index out of bounds. The
    native decoder runs by default on untrusted scanner files."""
    from mamri_tpu import native
    from mamri_tpu.perception import jpegll

    rng = np.random.default_rng(47)
    img = (np.cumsum(rng.integers(0, 300, (21, 27)), 1) % 50000).astype(np.uint16)
    enc = jpegll.encode_jpeg_lossless(img, 16)
    scan_start = enc.find(b"\xff\xda") + 10
    for trial in range(120):
        bad = bytearray(enc)
        for _ in range(int(rng.integers(1, 4))):
            pos = int(rng.integers(scan_start, len(bad)))
            bad[pos] ^= int(rng.integers(1, 256))
        try:
            py = jpegll.decode_jpeg_lossless(bytes(bad), use_native=False)[0]
        except ValueError:
            py = None
        except Exception as e:
            raise AssertionError(f"trial {trial}: python decoder crash {type(e).__name__}: {e}")
        if native.available():
            try:
                nat = native.jpegll_decode_native(bytes(bad))[0]
            except ValueError:
                nat = None
            if py is not None and nat is not None:
                np.testing.assert_array_equal(py, nat)
    # truncations anywhere in the file fail loudly too
    for cut in [3, scan_start, len(enc) - 3]:
        for decode in ([lambda b: jpegll.decode_jpeg_lossless(b, use_native=False)]
                       + ([native.jpegll_decode_native] if native.available() else [])):
            try:
                decode(bytes(enc[:cut]))
            except ValueError:
                pass


def test_dicom_deflated_roundtrip(tmp_path):
    """Deflated Explicit VR LE (1.2.840.10008.1.2.1.99, PS3.5 A.5): the whole
    dataset rides as one raw-deflate stream after the meta group. Both the
    per-slice and the multi-frame writer round-trip bit-exactly, and the
    compressed series is genuinely smaller on this smooth phantom."""
    from mamri_tpu.perception.dicom import (
        load_dicom_series,
        save_dicom_multiframe,
        save_dicom_series,
    )
    from mamri_tpu.perception.volume import Volume

    rng = np.random.default_rng(13)
    base = rng.integers(0, 40, (22, 18, 7)).astype(np.int64)
    data = np.cumsum(np.cumsum(base, 0), 1).astype(np.float32)  # compressible
    v = Volume(data=data, spacing=(1.0, 1.2, 2.0), origin=(1.0, -2.0, 3.0))
    d_z = str(tmp_path / "deflated")
    d_raw = str(tmp_path / "raw")
    save_dicom_series(d_z, v, transfer="deflated")
    save_dicom_series(d_raw, v)
    back = load_dicom_series(d_z)
    np.testing.assert_array_equal(back.data, data)
    np.testing.assert_allclose(back.spacing, v.spacing, atol=1e-6)
    np.testing.assert_allclose(back.origin, v.origin, atol=1e-5)
    z_size = sum(os.path.getsize(os.path.join(d_z, f)) for f in os.listdir(d_z))
    raw_size = sum(os.path.getsize(os.path.join(d_raw, f)) for f in os.listdir(d_raw))
    assert z_size < raw_size
    mf = tmp_path / "mf"
    save_dicom_multiframe(str(mf / "vol.dcm"), v, transfer="deflated")
    np.testing.assert_array_equal(load_dicom_series(str(mf)).data, data)


def test_jpegls_codec_property():
    """Property sweep of the T.87 (JPEG-LS) codec: smooth/random/flat/run-
    heavy images, 8/12/16-bit, single-row/column edges — every image must
    round-trip bit-exactly, and near-lossless streams must be rejected."""
    from mamri_tpu.perception import jpegls

    rng = np.random.default_rng(7)
    base = rng.integers(0, 500, (61, 45)).astype(np.int64)
    images = [
        ((np.cumsum(np.cumsum(base, 0), 1)) % 65536).astype(np.uint16),
        rng.integers(0, 65536, (33, 40)).astype(np.uint16),
        np.full((17, 19), 4242, np.uint16),
        (np.repeat(rng.integers(0, 4, (9, 7)), 5, axis=1) * 100).astype(np.uint16),
        np.zeros((13, 29), np.uint16),
        rng.integers(0, 65536, (20, 1)).astype(np.uint16),
        rng.integers(0, 65536, (1, 37)).astype(np.uint16),
    ]
    from mamri_tpu import native

    for img in images:
        enc = jpegls.encode_jpeg_ls(img, 16, use_native=False)
        dec, prec = jpegls.decode_jpeg_ls(enc, use_native=False)
        assert prec == 16
        np.testing.assert_array_equal(dec, img)
        if native.available():  # the C++ codec must agree with the oracle
            dn, pn = native.jpegls_decode_native(enc)
            assert pn == 16
            np.testing.assert_array_equal(dn, img)
            assert jpegls.encode_jpeg_ls(img, 16, use_native=True) == enc
    for prec, hi in ((8, 256), (12, 4096)):
        img = rng.integers(0, hi, (22, 26)).astype(np.uint16)
        enc = jpegls.encode_jpeg_ls(img, prec)
        dec, p = jpegls.decode_jpeg_ls(enc, use_native=False)
        assert p == prec
        np.testing.assert_array_equal(dec, img)
        if native.available():
            np.testing.assert_array_equal(native.jpegls_decode_native(enc)[0], img)
    # run mode must actually compress the run-heavy phantom
    runs = (np.repeat(rng.integers(0, 3, (40, 8)), 16, axis=1) * 7).astype(np.uint16)
    assert len(jpegls.encode_jpeg_ls(runs, 16)) < runs.nbytes // 4
    # a genuine NEAR=2 stream decodes within tolerance through both paths
    enc2 = jpegls.encode_jpeg_ls(images[0], 16, near=2)
    d2, _ = jpegls.decode_jpeg_ls(enc2, use_native=False)
    assert np.abs(d2.astype(np.int64) - images[0].astype(np.int64)).max() <= 2
    if native.available():
        np.testing.assert_array_equal(jpegls.decode_jpeg_ls(enc2)[0], d2)
    # truncated stream fails loudly
    with pytest.raises(ValueError):
        jpegls.decode_jpeg_ls(jpegls.encode_jpeg_ls(images[1], 16)[:30], use_native=False)
    with pytest.raises(ValueError):
        jpegls.decode_jpeg_ls(jpegls.encode_jpeg_ls(images[1], 16)[:30])


def test_dicom_jpegls_roundtrip(tmp_path):
    """JPEG-LS lossless (1.2.840.10008.1.2.4.80) — the third common lossless
    scanner transfer syntax (Slicer ingests it via its DICOM stack,
    Mamri.py:1306) — must round-trip BIT-exactly through both writers, and
    a directory of solely-unsupported files must say why it failed."""
    from mamri_tpu.perception.dicom import (
        load_dicom_series,
        save_dicom_multiframe,
        save_dicom_series,
    )
    from mamri_tpu.perception.volume import Volume

    rng = np.random.default_rng(15)
    data = rng.integers(-500, 2500, (20, 16, 6)).astype(np.float32)
    v = Volume(data=data, spacing=(1.0, 1.0, 2.0), origin=(-3.0, 2.0, 1.0))
    d = str(tmp_path / "ls")
    save_dicom_series(d, v, transfer="jpegls")
    back = load_dicom_series(d)
    np.testing.assert_array_equal(back.data, data)
    np.testing.assert_allclose(back.spacing, v.spacing, atol=1e-6)
    np.testing.assert_allclose(back.origin, v.origin, atol=1e-5)
    mf = tmp_path / "mf"
    save_dicom_multiframe(str(mf / "vol.dcm"), v, transfer="jpegls")
    np.testing.assert_array_equal(load_dicom_series(str(mf)).data, data)
    # a NEAR=0 scan relabeled as .81 is legal (near-lossless with NEAR=0)
    # and still round-trips exactly
    d81 = tmp_path / "near"
    d81.mkdir()
    raw = bytearray((tmp_path / "ls" / "slice_0000.dcm").read_bytes())
    i = raw.find(b"1.2.840.10008.1.2.4.80")
    raw[i : i + 22] = b"1.2.840.10008.1.2.4.81"
    (d81 / "f.dcm").write_bytes(bytes(raw))
    one = load_dicom_series(str(d81))
    np.testing.assert_array_equal(np.asarray(one.data)[:, :, 0], data[:, :, 0])


def test_jpegls_corrupt_streams_fail_loudly():
    """Byte-flip fuzz over a valid stream: BOTH decoders must either decode
    (agreeing with each other) or raise ValueError — never crash, never
    index out of bounds (the native decoder runs by default on untrusted
    scanner files)."""
    from mamri_tpu import native
    from mamri_tpu.perception import jpegls

    rng = np.random.default_rng(31)
    img = (np.cumsum(rng.integers(0, 200, (24, 31)), 1) % 60000).astype(np.uint16)
    enc = bytearray(jpegls.encode_jpeg_ls(img, 16))
    scan_start = enc.find(b"\xff\xda") + 10
    for _ in range(120):
        bad = bytearray(enc)
        pos = int(rng.integers(scan_start, len(bad) - 2))
        bad[pos] ^= int(rng.integers(1, 256))
        try:
            py = jpegls.decode_jpeg_ls(bytes(bad), use_native=False)[0]
        except ValueError:
            py = None
        if native.available():
            try:
                nat = native.jpegls_decode_native(bytes(bad))[0]
            except ValueError:
                nat = None
            if py is not None and nat is not None:
                np.testing.assert_array_equal(py, nat)


def test_dicom_loader_fuzz_fails_loudly(tmp_path):
    """Mutation fuzz over a valid file (truncations, single and multi byte
    flips): load_dicom_series must return a Volume or raise ValueError —
    never struct.error/TypeError/IndexError, never hang (corrupt scanner
    dumps and half-written files are everyday inputs)."""
    from mamri_tpu.perception.dicom import load_dicom_series, save_dicom_series
    from mamri_tpu.perception.volume import Volume

    rng = np.random.default_rng(3)
    v = Volume(data=rng.integers(0, 100, (8, 8, 2)).astype(np.float32),
               spacing=(1.0, 1.0, 1.0), origin=(0.0, 0.0, 0.0))
    src = tmp_path / "src"
    paths = save_dicom_series(str(src), v, transfer="rle")
    raw = open(paths[0], "rb").read()
    for trial in range(200):
        mode = rng.integers(0, 3)
        b = bytearray(raw)
        if mode == 0:
            b = b[: int(rng.integers(10, len(b)))]
        elif mode == 1:
            pos = int(rng.integers(0, len(b)))
            b[pos] ^= int(rng.integers(1, 256))
        else:
            for _ in range(8):
                pos = int(rng.integers(132, len(b)))
                b[pos] ^= int(rng.integers(1, 256))
        d = tmp_path / f"fuzz_{trial}"
        d.mkdir()
        (d / "f.dcm").write_bytes(bytes(b))
        try:
            load_dicom_series(str(d))
        except ValueError:
            pass


def test_nifti_loader_fuzz_fails_loudly(tmp_path):
    """Same contract as the DICOM fuzz: corrupt/truncated NIfTI files load
    or raise ValueError — no OverflowError from hostile vox_offset/dims."""
    import warnings

    from mamri_tpu.perception.volume import Volume

    rng = np.random.default_rng(4)
    v = Volume(data=rng.integers(0, 100, (8, 8, 4)).astype(np.float32),
               spacing=(1.0, 1.0, 1.0), origin=(0.0, 0.0, 0.0))
    p = str(tmp_path / "v.nii")
    save_nifti(p, v)
    raw = open(p, "rb").read()
    p2 = str(tmp_path / "fz.nii")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # overflow in corrupt scl_slope math
        for trial in range(200):
            mode = rng.integers(0, 3)
            b = bytearray(raw)
            if mode == 0:
                b = b[: int(rng.integers(4, len(b)))]
            elif mode == 1:
                pos = int(rng.integers(0, len(b)))
                b[pos] ^= int(rng.integers(1, 256))
            else:
                for _ in range(8):
                    pos = int(rng.integers(0, len(b)))
                    b[pos] ^= int(rng.integers(1, 256))
            open(p2, "wb").write(bytes(b))
            try:
                load_nifti(p2)
            except ValueError:
                pass


def test_jpegls_lse_preset_paths():
    """LSE preset parameters (T.87 C.2.4.1.1): explicit-default presets must
    decode identically to the preset-free stream, partial presets (only T1
    set, 0 = use-default per threshold — the case the native decoder once
    got wrong) must agree between the Python oracle and the C++ decoder."""
    import struct

    from mamri_tpu import native
    from mamri_tpu.perception import jpegls

    rng = np.random.default_rng(17)
    img = (np.cumsum(rng.integers(0, 300, (21, 27)), 1) % 50000).astype(np.uint16)
    enc = jpegls.encode_jpeg_ls(img, 16)
    sof_end = enc.find(b"\xff\xda")  # insert LSE right before SOS

    def with_lse(maxval, t1, t2, t3, reset):
        lse = struct.pack(">HHB5H", 0xFFF8, 13, 1, maxval, t1, t2, t3, reset)
        return enc[:sof_end] + lse + enc[sof_end:]

    # defaults for maxval 65535: factor 16 -> T1=18, T2=67, T3=276
    explicit = with_lse(65535, 18, 67, 276, 64)
    dec, _ = jpegls.decode_jpeg_ls(explicit, use_native=False)
    np.testing.assert_array_equal(dec, img)
    if native.available():
        np.testing.assert_array_equal(native.jpegls_decode_native(explicit)[0], img)

    # partial preset: only T1 given (and it IS the default) -> still exact
    partial = with_lse(0, 18, 0, 0, 0)
    dec, _ = jpegls.decode_jpeg_ls(partial, use_native=False)
    np.testing.assert_array_equal(dec, img)
    if native.available():
        np.testing.assert_array_equal(native.jpegls_decode_native(partial)[0], img)

    # off-default T1: decoders must AGREE (same context evolution), whether
    # they produce samples or both reject the now-inconsistent stream
    off = with_lse(0, 25, 0, 0, 0)
    try:
        py = jpegls.decode_jpeg_ls(off, use_native=False)[0]
    except ValueError:
        py = None
    if native.available():
        try:
            nat = native.jpegls_decode_native(off)[0]
        except ValueError:
            nat = None
        if py is not None and nat is not None:
            np.testing.assert_array_equal(py, nat)
        else:
            assert py is None and nat is None


def test_load_dicom_single_file():
    """`load_dicom(path)`: an Enhanced multi-frame file is a full volume in
    one SOP instance; a lone classic slice loads as a 1-slice volume."""
    import tempfile

    from mamri_tpu.perception.dicom import load_dicom, save_dicom_multiframe, save_dicom_series
    from mamri_tpu.perception.volume import Volume

    rng = np.random.default_rng(7)
    data = rng.integers(0, 900, (12, 10, 4)).astype(np.float32)
    vol = Volume(data=data, spacing=np.array([1.0, 1.5, 2.0], np.float32),
                 origin=np.array([3.0, -2.0, 8.0], np.float32))
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "mf.dcm")
        save_dicom_multiframe(p, vol, transfer="rle")
        back = load_dicom(p)
        np.testing.assert_array_equal(np.asarray(back.data), data)
        np.testing.assert_allclose(np.asarray(back.spacing), vol.spacing)
        np.testing.assert_allclose(np.asarray(back.origin), vol.origin)
        d2 = os.path.join(d, "series")
        save_dicom_series(d2, vol)
        one = load_dicom(os.path.join(d2, sorted(os.listdir(d2))[0]))
        assert np.asarray(one.data).shape == (12, 10, 1)
        np.testing.assert_array_equal(np.asarray(one.data)[:, :, 0], data[:, :, 0])
        with pytest.raises(ValueError, match="not a file"):
            load_dicom(d2)


def test_jpegls_near_lossless_codec_property():
    """NEAR>0 (T.87 near-lossless): every reconstructed sample within NEAR
    of the source, sizes shrink with NEAR, native C++ bit-identical."""
    from mamri_tpu import native
    from mamri_tpu.perception import jpegls

    rng = np.random.default_rng(19)
    yy, xx = np.mgrid[:40, :36]
    smooth = np.clip(600 + 350 * np.sin(yy / 7.0) + rng.normal(0, 6, (40, 36)), 0, 4095)
    cases = [
        (smooth.astype(np.uint16), 12),
        (rng.integers(0, 4096, (23, 31)).astype(np.uint16), 12),
        (rng.integers(0, 256, (17, 19)).astype(np.uint16), 8),
        (np.full((12, 30), 77, np.uint16), 8),
        (rng.integers(0, 1 << 16, (21, 14)).astype(np.uint16), 16),
    ]
    for img, prec in cases:
        sizes = []
        for near in (0, 1, 2, 5):
            if near > min(255, ((1 << prec) - 1) // 2):
                continue
            enc = jpegls.encode_jpeg_ls(img, prec, use_native=False, near=near)
            dec, p = jpegls.decode_jpeg_ls(enc, use_native=False)
            assert p == prec
            err = np.abs(dec.astype(np.int64) - img.astype(np.int64)).max()
            assert err <= near, (prec, near, err)
            sizes.append(len(enc))
            if native.available():
                assert jpegls.encode_jpeg_ls(img, prec, use_native=True, near=near) == enc
                np.testing.assert_array_equal(jpegls.decode_jpeg_ls(enc, use_native=True)[0], dec)
        assert sizes == sorted(sizes, reverse=True) or len(set(sizes)) == 1
    with pytest.raises(ValueError, match="NEAR"):
        jpegls.encode_jpeg_ls(cases[0][0], 12, near=3000)


def test_dicom_jpegls_near_lossless_transfer():
    """transfer='jpegls', near=k writes .81 with a per-sample data-unit
    error bound of k*RescaleSlope; mislabeling near-lossless content as the
    lossless .80 UID is refused."""
    import tempfile

    from mamri_tpu.perception.dicom import (
        load_dicom,
        load_dicom_series,
        save_dicom_multiframe,
        save_dicom_series,
    )
    from mamri_tpu.perception.volume import Volume

    rng = np.random.default_rng(6)
    data = rng.integers(0, 1400, (24, 20, 3)).astype(np.float32)
    vol = Volume(data=data, spacing=np.ones(3, np.float32), origin=np.zeros(3, np.float32))
    with tempfile.TemporaryDirectory() as d:
        dd = os.path.join(d, "n2")
        save_dicom_series(dd, vol, transfer="jpegls", near=2)
        raw = open(os.path.join(dd, sorted(os.listdir(dd))[0]), "rb").read()
        assert b"1.2.840.10008.1.2.4.81" in raw
        assert np.abs(np.asarray(load_dicom_series(dd).data) - data).max() <= 2
        p = os.path.join(d, "mf.dcm")
        save_dicom_multiframe(p, vol, transfer="jpegls", near=3)
        assert np.abs(np.asarray(load_dicom(p).data) - data).max() <= 3
        with pytest.raises(ValueError, match="near"):
            save_dicom_series(os.path.join(d, "x"), vol, transfer="rle", near=2)
        # mislabeled: rewrite the .81 UID as .80 (same length) -> refused
        for f in os.listdir(dd):
            q = os.path.join(dd, f)
            b = open(q, "rb").read()
            open(q, "wb").write(
                b.replace(b"1.2.840.10008.1.2.4.81", b"1.2.840.10008.1.2.4.80")
            )
        with pytest.raises(ValueError, match="mislabeled|LOSSLESS"):
            load_dicom_series(dd)


def test_jpegls_near_unsigned_storage_protects_sign_boundary():
    """Near-lossless exports store UNSIGNED samples: with the old signed
    representation, a NEAR-sized nudge across the int16 32767/32768
    pattern boundary flipped the sign for a ~65k-step error. Non-integral
    data maps its max voxel to the top stored step — the boundary case."""
    import tempfile

    from mamri_tpu.perception.dicom import load_dicom_series, save_dicom_series
    from mamri_tpu.perception.volume import Volume

    rng = np.random.default_rng(44)
    data = (rng.random((30, 26, 2), dtype=np.float64) * 70000.0).astype(np.float32)
    vol = Volume(data=data, spacing=np.ones(3, np.float32), origin=np.zeros(3, np.float32))
    with tempfile.TemporaryDirectory() as d:
        save_dicom_series(d, vol, transfer="jpegls", near=3)
        back = np.asarray(load_dicom_series(d).data)
        slope = 70000.0 / 64767.0
        # quantization-grid error (slope/2) + NEAR bound (3*slope)
        assert np.abs(back - data).max() <= (3 + 0.5) * slope * 1.01


def test_signed_sub16_jpeg_sign_extension(tmp_path):
    """Third-party 12-bit SIGNED JPEG-LS/JPEG-LL series: the decoded
    BitsStored-wide two's-complement patterns must sign-extend (0x0FFF at
    precision 12 is -1, not +4095). Crafted by re-wrapping a 12-bit scan
    under PixelRepresentation=1."""
    import struct as st

    import mamri_tpu.perception.dicom as D
    from mamri_tpu.perception.dicom import load_dicom_series
    from mamri_tpu.perception.jpegll import encode_jpeg_lossless
    from mamri_tpu.perception.jpegls import encode_jpeg_ls

    rng = np.random.default_rng(3)
    signed_vals = rng.integers(-2048, 2048, (12, 10)).astype(np.int32)
    patterns = (signed_vals & 0xFFF).astype(np.uint16)  # 12-bit two's complement
    for name, frame in (
        ("ls", encode_jpeg_ls(patterns, 12)),
        ("ll", encode_jpeg_lossless(patterns, 12)),
    ):
        if len(frame) % 2:
            frame += b"\x00"
        body = b"".join([
            D._el(0x0008, 0x0016, b"UI", D._MR_STORAGE.encode()),
            D._el(0x0008, 0x0018, b"UI", b"1.2.3.4"),
            D._el(0x0020, 0x000E, b"UI", b"1.2.3"),
            D._el(0x0020, 0x0032, b"DS", D._ds([0, 0, 0])),
            D._el(0x0020, 0x0037, b"DS", D._ds([1, 0, 0, 0, 1, 0])),
            D._el(0x0028, 0x0002, b"US", st.pack("<H", 1)),
            D._el(0x0028, 0x0010, b"US", st.pack("<H", 12)),
            D._el(0x0028, 0x0011, b"US", st.pack("<H", 10)),
            D._el(0x0028, 0x0030, b"DS", D._ds([1.0, 1.0])),
            D._el(0x0028, 0x0100, b"US", st.pack("<H", 16)),
            D._el(0x0028, 0x0101, b"US", st.pack("<H", 12)),
            D._el(0x0028, 0x0102, b"US", st.pack("<H", 11)),
            D._el(0x0028, 0x0103, b"US", st.pack("<H", 1)),  # SIGNED
            D._encapsulate([frame]),
        ])
        uid = {"ls": b"1.2.840.10008.1.2.4.80", "ll": b"1.2.840.10008.1.2.4.70"}[name]
        meta_body = b"".join([
            D._el(0x0002, 0x0001, b"OB", b"\x00\x01"),
            D._el(0x0002, 0x0002, b"UI", D._MR_STORAGE.encode()),
            D._el(0x0002, 0x0003, b"UI", b"1.2.3.4"),
            D._el(0x0002, 0x0010, b"UI", uid),
        ])
        meta = D._el(0x0002, 0x0000, b"UL", st.pack("<I", len(meta_body))) + meta_body
        d = tmp_path / name
        d.mkdir()
        (d / "f.dcm").write_bytes(b"\x00" * 128 + b"DICM" + meta + body)
        got = np.asarray(load_dicom_series(str(d)).data)[:, :, 0].T
        np.testing.assert_array_equal(got, signed_vals.astype(np.float32))


def test_jpegls_lse_partial_preset_matches_native_and_validates():
    """A partial LSE preset (T1 set, T2/T3 defaulted) must decode to the
    same pixels through the Python and native paths; inconsistent presets
    are rejected rather than silently mis-quantized."""
    import struct as st

    from mamri_tpu import native
    from mamri_tpu.perception import jpegls

    rng = np.random.default_rng(5)
    img = rng.integers(0, 1 << 16, (20, 24)).astype(np.uint16)
    base = jpegls.encode_jpeg_ls(img, 16)

    def with_lse(mv, t1, t2, t3):
        sof_end = base.find(b"\xff\xda")
        lse = st.pack(">HHB5H", 0xFFF8, 13, 1, mv, t1, t2, t3, 64)
        return base[:sof_end] + lse + base[sof_end:]

    # T1 pushed ABOVE the default T2: the defaulted T2/T3 must re-clamp
    data = with_lse(0, 100, 0, 0)
    try:
        py = jpegls.decode_jpeg_ls(data, use_native=False)[0]
        py_err = None
    except ValueError as e:
        py, py_err = None, e
    if native.available():
        try:
            nat = jpegls.decode_jpeg_ls(data, use_native=True)[0]
            nat_err = None
        except ValueError as e:
            nat, nat_err = None, e
        assert (py is None) == (nat is None), (py_err, nat_err)
        if py is not None:
            np.testing.assert_array_equal(py, nat)
    # explicitly inconsistent presets (T2 < T1) are refused
    bad = with_lse(0, 300, 200, 0)
    with pytest.raises(ValueError):
        jpegls.decode_jpeg_ls(bad, use_native=False)


def test_nifti_qform_only(tmp_path):
    """Real scanners often write only the qform (sform_code=0). A 180-deg-
    about-z quaternion with the right offsets must reproduce exactly what the
    equivalent sform gives; qfac=-1 must flip the z column."""
    import struct

    from mamri_tpu.perception.volume import Volume

    data = (np.arange(4 * 3 * 2, dtype=np.float32) % 97).reshape(4, 3, 2)
    v = Volume(data=data, spacing=(1.0, 2.0, 3.0), origin=(5.0, 6.0, 7.0))
    p = str(tmp_path / "q.nii")
    save_nifti(p, v)
    raw = bytearray(open(p, "rb").read())
    sform_loaded = load_nifti(p)

    # rewrite as qform-only: sform off, quaternion (a=0,b=0,c=0,d=1) = RotZ(180)
    # -> RAS columns (-sx, -sy, +sz), identical to save_nifti's srow
    origin_ras = (-5.0, -6.0, 7.0)
    struct.pack_into("<h", raw, 252, 1)      # qform_code
    struct.pack_into("<h", raw, 254, 0)      # sform_code off
    struct.pack_into("<3f", raw, 256, 0.0, 0.0, 1.0)   # quatern b, c, d
    struct.pack_into("<3f", raw, 268, *origin_ras)     # qoffset x, y, z
    struct.pack_into("<f", raw, 76, 1.0)     # pixdim[0] = qfac +1
    open(p, "wb").write(raw)
    q = load_nifti(p)
    np.testing.assert_array_equal(q.data, sform_loaded.data)
    np.testing.assert_allclose(q.spacing, sform_loaded.spacing, atol=1e-6)
    np.testing.assert_allclose(q.origin, sform_loaded.origin, atol=1e-5)

    # identity quaternion + qfac=-1: RAS affine diag(1,2,-3) -> LPS flips
    # all three axes, origin moves to each kept corner
    struct.pack_into("<3f", raw, 256, 0.0, 0.0, 0.0)
    struct.pack_into("<3f", raw, 268, 5.0, 6.0, 7.0)
    struct.pack_into("<f", raw, 76, -1.0)    # qfac -1
    open(p, "wb").write(raw)
    q2 = load_nifti(p)
    np.testing.assert_array_equal(q2.data, data[::-1, ::-1, ::-1])
    np.testing.assert_allclose(q2.spacing, [1.0, 2.0, 3.0], atol=1e-6)
    np.testing.assert_allclose(
        q2.origin, [-5.0 - 1.0 * 3, -6.0 - 2.0 * 2, 7.0 - 3.0 * 1], atol=1e-5
    )
