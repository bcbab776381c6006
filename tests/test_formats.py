"""NRRD + MetaImage readers/writers and the load_volume dispatcher.

The reference ingests whatever volume node the Slicer scene holds
(Mamri/Mamri.py:1306) — Slicer users' files are most often NRRD (its native
research format) or MetaImage. Fixtures here are written BYTE-BY-BYTE from
the format specifications (not by this repo's writers), so the loaders are
pinned against independent encodings; writer coverage comes from roundtrips
and cross-format consistency with the NIfTI path.
"""

import bz2
import gzip
import struct
import zlib

import numpy as np
import pytest

from mamri_tpu.perception.formats import (
    load_metaimage,
    load_nrrd,
    load_volume,
    save_metaimage,
    save_nrrd,
    save_volume,
)
from mamri_tpu.perception.io import load_nifti, save_nifti
from mamri_tpu.perception.volume import synthetic_volume


def _asym_data(shape, dtype=np.float32):
    """Small volume with no symmetry — any axis permutation/flip changes it."""
    n = int(np.prod(shape))
    return (np.arange(n, dtype=np.float64) % 251).astype(dtype).reshape(shape)


# ---------------------------------------------------------------------- NRRD


def test_nrrd_roundtrip(tmp_path):
    v = synthetic_volume(shape=(24, 32, 20), spacing=(1.0, 1.5, 2.0),
                         fiducials_ras=np.array([[0.0, 0.0, 0.0]]))
    for enc in ("gzip", "raw"):
        p = str(tmp_path / f"vol_{enc}.nrrd")
        save_nrrd(p, v, encoding=enc)
        back = load_nrrd(p)
        np.testing.assert_array_equal(back.data, v.data)
        np.testing.assert_allclose(back.spacing, v.spacing, atol=1e-6)
        np.testing.assert_allclose(back.origin, v.origin, atol=1e-5)


def test_nrrd_handwritten_short_lps(tmp_path):
    """Byte-level int16 LPS fixture: first axis fastest, fields out of order,
    comments and key:=value pairs interleaved."""
    data = _asym_data((5, 4, 3), np.int16)
    hdr = (
        b"NRRD0005\n"
        b"# a comment line\n"
        b"type: short\n"
        b"space: left-posterior-superior\n"
        b"dimension: 3\n"
        b"modality:=MRI\n"
        b"sizes: 5 4 3\n"
        b"kinds: domain domain domain\n"
        b"endian: little\n"
        b"encoding: raw\n"
        b"space directions: (0.5,0,0) (0,0.7,0) (0,0,1.25)\n"
        b"space origin: (-10,20,-3.5)\n"
        b"\n"
    )
    p = str(tmp_path / "hand.nrrd")
    with open(p, "wb") as f:
        f.write(hdr + data.astype("<i2").tobytes(order="F"))
    vol = load_nrrd(p)
    np.testing.assert_array_equal(vol.data, data.astype(np.float32))
    np.testing.assert_allclose(vol.spacing, [0.5, 0.7, 1.25], atol=1e-6)
    np.testing.assert_allclose(vol.origin, [-10.0, 20.0, -3.5], atol=1e-6)


def test_nrrd_ras_space_converts_to_lps(tmp_path):
    """RAS-space NRRD: +x RAS = -x LPS, so the loader must flip x and y axes
    (and shift the origin to the kept corner)."""
    data = _asym_data((4, 3, 2))
    hdr = (
        b"NRRD0004\n"
        b"type: float\n"
        b"dimension: 3\n"
        b"space: right-anterior-superior\n"
        b"sizes: 4 3 2\n"
        b"endian: little\n"
        b"encoding: raw\n"
        b"space directions: (1,0,0) (0,2,0) (0,0,3)\n"
        b"space origin: (5,6,7)\n"
        b"\n"
    )
    p = str(tmp_path / "ras.nrrd")
    with open(p, "wb") as f:
        f.write(hdr + data.astype("<f4").tobytes(order="F"))
    vol = load_nrrd(p)
    # LPS affine columns are (-1,0,0),(0,-2,0),(0,0,3), origin (-5,-6,7):
    # x and y axes flip, x origin moves to -5 - 1*(4-1), y to -6 - 2*(3-1)
    np.testing.assert_array_equal(vol.data, data[::-1, ::-1, :])
    np.testing.assert_allclose(vol.spacing, [1.0, 2.0, 3.0], atol=1e-6)
    np.testing.assert_allclose(vol.origin, [-8.0, -10.0, 7.0], atol=1e-6)


def test_nrrd_detached_header_with_skips(tmp_path):
    data = _asym_data((6, 5, 4), np.uint8)
    (tmp_path / "payload.raw").write_bytes(
        b"junkline\n" + b"\xAB" * 7 + data.tobytes(order="F")
    )
    hdr = (
        b"NRRD0004\n"
        b"type: uchar\n"
        b"dimension: 3\n"
        b"sizes: 6 5 4\n"
        b"encoding: raw\n"
        b"spacings: 1 1 2\n"
        b"line skip: 1\n"
        b"byte skip: 7\n"
        b"data file: payload.raw\n"
        b"\n"
    )
    p = str(tmp_path / "vol.nhdr")
    with open(p, "wb") as f:
        f.write(hdr)
    vol = load_nrrd(p)
    np.testing.assert_array_equal(vol.data, data.astype(np.float32))
    np.testing.assert_allclose(vol.spacing, [1.0, 1.0, 2.0])
    # byte skip -1: data are the LAST count bytes regardless of junk size
    (tmp_path / "tail.raw").write_bytes(b"\x00" * 33 + data.tobytes(order="F"))
    hdr2 = hdr.replace(b"line skip: 1\nbyte skip: 7\ndata file: payload.raw",
                       b"byte skip: -1\ndata file: tail.raw")
    p2 = str(tmp_path / "tail.nhdr")
    with open(p2, "wb") as f:
        f.write(hdr2)
    np.testing.assert_array_equal(load_nrrd(p2).data, data.astype(np.float32))


def test_nrrd_encodings_and_endian(tmp_path):
    data = _asym_data((3, 4, 5), np.int32)
    base = (
        "NRRD0004\ntype: int32\ndimension: 3\nsizes: 3 4 5\n"
        "spacings: 1 1 1\nendian: {endian}\nencoding: {enc}\n\n"
    )
    cases = [
        ("gzip", "little", gzip.compress(data.astype("<i4").tobytes(order="F"))),
        ("bzip2", "little", bz2.compress(data.astype("<i4").tobytes(order="F"))),
        ("gz", "big", gzip.compress(data.astype(">i4").tobytes(order="F"))),
        ("ascii", "little",
         " ".join(str(x) for x in data.flatten(order="F")).encode()),
        ("raw", "big", data.astype(">i4").tobytes(order="F")),
    ]
    for enc, endian, payload in cases:
        p = str(tmp_path / f"e_{enc}_{endian}.nrrd")
        with open(p, "wb") as f:
            f.write(base.format(enc=enc, endian=endian).encode() + payload)
        np.testing.assert_array_equal(
            load_nrrd(p).data, data.astype(np.float32), err_msg=f"{enc}/{endian}"
        )


def test_nrrd_rejects_malformed(tmp_path):
    def write(name, body):
        p = str(tmp_path / name)
        with open(p, "wb") as f:
            f.write(body)
        return p

    ok_data = np.zeros((2, 2, 2), "<f4").tobytes()
    cases = {
        "magic.nrrd": b"NRRD9999\n\n",
        "notnrrd.nrrd": b"hello world\n\n",
        "dim2.nrrd": b"NRRD0004\ntype: float\ndimension: 2\nsizes: 2 2\nencoding: raw\n\n" + ok_data,
        "badenc.nrrd": b"NRRD0004\ntype: float\ndimension: 3\nsizes: 2 2 2\nencoding: hex\n\n" + ok_data,
        "badtype.nrrd": b"NRRD0004\ntype: block\ndimension: 3\nsizes: 2 2 2\nencoding: raw\n\n" + ok_data,
        "list.nhdr": b"NRRD0004\ntype: float\ndimension: 3\nsizes: 2 2 2\nencoding: raw\ndata file: LIST\n\n",
        "trunc.nrrd": b"NRRD0004\ntype: float\ndimension: 3\nsizes: 8 8 8\nencoding: raw\n\n" + ok_data,
        "badspace.nrrd": b"NRRD0004\ntype: float\ndimension: 3\nsizes: 2 2 2\nencoding: raw\nspace: pixel-space\n\n" + ok_data,
        "noterm.nrrd": b"NRRD0004\ntype: float\ndimension: 3\nsizes: 2 2 2\nencoding: raw\n",
    }
    for name, body in cases.items():
        with pytest.raises(ValueError):
            load_nrrd(write(name, body))


def test_nrrd_oblique_resamples(tmp_path):
    """Non-axis-aligned space directions go through the resampler (same code
    path as oblique NIfTI/DICOM) instead of erroring."""
    data = np.zeros((10, 10, 10), np.float32)
    data[4:6, 4:6, 4:6] = 100.0
    c, s = np.cos(np.deg2rad(20)), np.sin(np.deg2rad(20))
    hdr = (
        "NRRD0004\ntype: float\ndimension: 3\nsizes: 10 10 10\n"
        "space: left-posterior-superior\nendian: little\nencoding: raw\n"
        f"space directions: ({c},{s},0) ({-s},{c},0) (0,0,1)\n"
        "space origin: (0,0,0)\n\n"
    ).encode()
    p = str(tmp_path / "obl.nrrd")
    with open(p, "wb") as f:
        f.write(hdr + data.astype("<f4").tobytes(order="F"))
    vol = load_nrrd(p)
    assert vol.data.max() > 50.0  # the cube survives resampling
    np.testing.assert_allclose(vol.spacing, [1.0, 1.0, 1.0], atol=1e-6)


# ----------------------------------------------------------------- MetaImage


def test_metaimage_roundtrip(tmp_path):
    v = synthetic_volume(shape=(16, 20, 12), spacing=(0.8, 1.0, 2.5),
                         fiducials_ras=np.array([[0.0, 0.0, 0.0]]))
    for compressed in (True, False):
        p = str(tmp_path / f"vol_{compressed}.mha")
        save_metaimage(p, v, compressed=compressed)
        back = load_metaimage(p)
        np.testing.assert_array_equal(back.data, v.data)
        np.testing.assert_allclose(back.spacing, v.spacing, atol=1e-6)
        np.testing.assert_allclose(back.origin, v.origin, atol=1e-5)


def test_metaimage_handwritten_ushort_msb(tmp_path):
    data = _asym_data((4, 5, 6), np.uint16)
    hdr = (
        b"ObjectType = Image\n"
        b"NDims = 3\n"
        b"BinaryData = True\n"
        b"BinaryDataByteOrderMSB = True\n"
        b"CompressedData = False\n"
        b"TransformMatrix = 1 0 0 0 1 0 0 0 1\n"
        b"Offset = 1.5 -2 3\n"
        b"ElementSpacing = 0.5 0.5 2\n"
        b"DimSize = 4 5 6\n"
        b"ElementType = MET_USHORT\n"
        b"ElementDataFile = LOCAL\n"
    )
    p = str(tmp_path / "hand.mha")
    with open(p, "wb") as f:
        f.write(hdr + data.astype(">u2").tobytes(order="F"))
    vol = load_metaimage(p)
    np.testing.assert_array_equal(vol.data, data.astype(np.float32))
    np.testing.assert_allclose(vol.spacing, [0.5, 0.5, 2.0], atol=1e-6)
    np.testing.assert_allclose(vol.origin, [1.5, -2.0, 3.0], atol=1e-6)


def test_metaimage_detached_mhd(tmp_path):
    data = _asym_data((6, 4, 3), np.int16)
    raw = data.astype("<i2").tobytes(order="F")
    (tmp_path / "vol.raw").write_bytes(raw)
    (tmp_path / "vol.zraw").write_bytes(zlib.compress(raw))
    for datafile, compressed in (("vol.raw", "False"), ("vol.zraw", "True")):
        hdr = (
            f"ObjectType = Image\nNDims = 3\nBinaryData = True\n"
            f"CompressedData = {compressed}\nOffset = 0 0 0\n"
            f"ElementSpacing = 1 1 1\nDimSize = 6 4 3\n"
            f"ElementType = MET_SHORT\nElementDataFile = {datafile}\n"
        ).encode()
        p = str(tmp_path / f"vol_{compressed}.mhd")
        with open(p, "wb") as f:
            f.write(hdr)
        np.testing.assert_array_equal(
            load_metaimage(p).data, data.astype(np.float32), err_msg=datafile
        )


def test_metaimage_axis_flip_normalizes(tmp_path):
    """TransformMatrix row 0 = (-1,0,0): axis 0 runs along -x LPS; the loader
    must flip it and move the origin to the kept corner."""
    data = _asym_data((5, 3, 2))
    hdr = (
        b"ObjectType = Image\nNDims = 3\nBinaryData = True\n"
        b"CompressedData = False\n"
        b"TransformMatrix = -1 0 0 0 1 0 0 0 1\n"
        b"Offset = 10 0 0\n"
        b"ElementSpacing = 2 1 1\nDimSize = 5 3 2\n"
        b"ElementType = MET_FLOAT\nElementDataFile = LOCAL\n"
    )
    p = str(tmp_path / "flip.mha")
    with open(p, "wb") as f:
        f.write(hdr + data.astype("<f4").tobytes(order="F"))
    vol = load_metaimage(p)
    np.testing.assert_array_equal(vol.data, data[::-1, :, :])
    np.testing.assert_allclose(vol.spacing, [2.0, 1.0, 1.0], atol=1e-6)
    # kept corner: 10 - 2*(5-1) = 2
    np.testing.assert_allclose(vol.origin, [2.0, 0.0, 0.0], atol=1e-6)


def test_metaimage_rejects_malformed(tmp_path):
    def write(name, body):
        p = str(tmp_path / name)
        with open(p, "wb") as f:
            f.write(body)
        return p

    cases = {
        "nodata.mha": b"ObjectType = Image\nNDims = 3\nDimSize = 2 2 2\n",
        "ndims.mha": b"ObjectType = Image\nNDims = 2\nDimSize = 2 2\nElementType = MET_FLOAT\nElementDataFile = LOCAL\n",
        "badtype.mha": b"ObjectType = Image\nNDims = 3\nDimSize = 2 2 2\nElementType = MET_COMPLEX\nElementDataFile = LOCAL\n",
        "list.mhd": b"ObjectType = Image\nNDims = 3\nDimSize = 2 2 2\nElementType = MET_FLOAT\nElementDataFile = LIST\n",
        "trunc.mha": b"ObjectType = Image\nNDims = 3\nDimSize = 9 9 9\nElementType = MET_FLOAT\nElementDataFile = LOCAL\n" + b"\x00" * 16,
        "chans.mha": b"ObjectType = Image\nNDims = 3\nElementNumberOfChannels = 3\nDimSize = 2 2 2\nElementType = MET_FLOAT\nElementDataFile = LOCAL\n",
    }
    for name, body in cases.items():
        with pytest.raises(ValueError):
            load_metaimage(write(name, body))


# ------------------------------------------------------------------ dispatch


def test_cross_format_consistency(tmp_path):
    """The same volume through NIfTI, NRRD, and MetaImage loads identically —
    all three writers/readers agree on geometry and values."""
    v = synthetic_volume(shape=(14, 18, 10), spacing=(1.0, 1.25, 2.0),
                         fiducials_ras=np.array([[2.0, -3.0, 4.0]]))
    paths = {
        "nii": str(tmp_path / "v.nii.gz"),
        "nrrd": str(tmp_path / "v.nrrd"),
        "mha": str(tmp_path / "v.mha"),
    }
    save_nifti(paths["nii"], v)
    save_nrrd(paths["nrrd"], v)
    save_metaimage(paths["mha"], v)
    vols = {k: load_volume(p) for k, p in paths.items()}
    for k, vol in vols.items():
        np.testing.assert_array_equal(vol.data, v.data, err_msg=k)
        np.testing.assert_allclose(vol.spacing, v.spacing, atol=1e-5, err_msg=k)
        np.testing.assert_allclose(vol.origin, v.origin, atol=1e-4, err_msg=k)


def test_load_volume_sniffs_extensionless(tmp_path):
    v = synthetic_volume(shape=(8, 8, 8), spacing=(1.0, 1.0, 1.0))
    for saver in (save_nrrd, save_metaimage, save_nifti):
        p = str(tmp_path / f"blob_{saver.__name__}")  # no extension
        saver(p, v)
        np.testing.assert_array_equal(load_volume(p).data, v.data,
                                      err_msg=saver.__name__)


def test_save_volume_dispatch(tmp_path):
    v = synthetic_volume(shape=(6, 6, 6), spacing=(1.0, 1.0, 1.0))
    for name in ("a.nrrd", "a.mha", "a.nii.gz"):
        p = str(tmp_path / name)
        save_volume(p, v)
        np.testing.assert_array_equal(load_volume(p).data, v.data, err_msg=name)
    with pytest.raises(ValueError):
        save_volume(str(tmp_path / "a.xyz"), v)


def test_nrrd_corrupt_compressed_raises_valueerror(tmp_path):
    """Truncated/garbled compressed payloads must surface as ValueError (the
    loader contract the CLI error handler relies on), not EOFError/zlib.error."""
    base = "NRRD0004\ntype: float\ndimension: 3\nsizes: 2 2 2\nencoding: {enc}\n\n"
    good = gzip.compress(np.zeros((2, 2, 2), "<f4").tobytes())
    cases = [
        ("gzip", good[: len(good) // 2]),   # truncated stream
        ("gzip", b"\x1f\x8b" + b"\xff" * 20),  # garbled body
        ("bzip2", b"BZh9" + b"\x00" * 10),
    ]
    for enc, payload in cases:
        p = str(tmp_path / f"bad_{enc}_{len(payload)}.nrrd")
        with open(p, "wb") as f:
            f.write(base.format(enc=enc).encode() + payload)
        with pytest.raises(ValueError):
            load_nrrd(p)


def test_nrrd_legacy_negative_spacing_flips(tmp_path):
    """Legacy 'spacings' with a negative value = decreasing world coordinate:
    the axis must flip (with the origin moved), not silently abs()."""
    data = _asym_data((4, 3, 2))
    hdr = (
        b"NRRD0004\ntype: float\ndimension: 3\nsizes: 4 3 2\n"
        b"encoding: raw\nspacings: 1 -2 3\n\n"
    )
    p = str(tmp_path / "neg.nrrd")
    with open(p, "wb") as f:
        f.write(hdr + data.astype("<f4").tobytes(order="F"))
    vol = load_nrrd(p)
    np.testing.assert_array_equal(vol.data, data[:, ::-1, :])
    np.testing.assert_allclose(vol.spacing, [1.0, 2.0, 3.0], atol=1e-6)
    np.testing.assert_allclose(vol.origin, [0.0, -4.0, 0.0], atol=1e-6)


def test_nrrd_detached_writer_roundtrip(tmp_path):
    v = synthetic_volume(shape=(10, 8, 6), spacing=(1.0, 1.5, 2.0))
    for enc, datafile in (("gzip", "v.raw.gz"), ("raw", "v.raw")):
        p = str(tmp_path / "v.nhdr")
        save_nrrd(p, v, encoding=enc)
        assert (tmp_path / datafile).exists()
        back = load_nrrd(p)
        np.testing.assert_array_equal(back.data, v.data)
        np.testing.assert_allclose(back.spacing, v.spacing, atol=1e-6)


def test_metaimage_corrupt_and_headersize_contract(tmp_path):
    common = (
        b"ObjectType = Image\nNDims = 3\nDimSize = 2 2 2\n"
        b"ElementType = MET_FLOAT\n"
    )
    cases = {
        # corrupt zlib payload -> ValueError, not zlib.error
        "corrupt.mha": common + b"CompressedData = True\nElementDataFile = LOCAL\n" + b"\xde\xad\xbe\xef" * 8,
        # HeaderSize -1 is undefined for compressed data -> reject
        "hs.mha": common + b"CompressedData = True\nHeaderSize = -1\nElementDataFile = LOCAL\n"
        + zlib.compress(np.zeros((2, 2, 2), "<f4").tobytes()),
        # missing DimSize -> ValueError, not KeyError
        "nodim.mha": b"ObjectType = Image\nNDims = 3\nElementType = MET_FLOAT\nElementDataFile = LOCAL\n" + b"\x00" * 32,
    }
    for name, body in cases.items():
        p = str(tmp_path / name)
        with open(p, "wb") as f:
            f.write(body)
        with pytest.raises(ValueError):
            load_metaimage(p)


def test_seg_nrrd_slicer_conventions(tmp_path):
    """save_seg_nrrd: uint8 labelmap with Slicer segmentation metadata,
    loadable by the plain NRRD reader (labels intact, geometry exact)."""
    from mamri_tpu.perception.formats import save_seg_nrrd

    body = np.zeros((12, 10, 8), bool)
    body[2:7, 3:8, 1:5] = True
    lesion = np.zeros_like(body)
    lesion[8:10, 1:3, 6:8] = True
    p = str(tmp_path / "auto.seg.nrrd")
    save_seg_nrrd(p, {"Body": body, "Lesion": lesion},
                  spacing=(1.0, 1.5, 2.0), origin=(-3.0, 4.0, 5.0))

    back = load_volume(p)  # .seg.nrrd ends with .nrrd -> NRRD reader
    np.testing.assert_array_equal(back.data == 1.0, body)
    np.testing.assert_array_equal(back.data == 2.0, lesion)
    np.testing.assert_allclose(back.spacing, [1.0, 1.5, 2.0], atol=1e-6)
    np.testing.assert_allclose(back.origin, [-3.0, 4.0, 5.0], atol=1e-6)

    head = open(p, "rb").read(4096).split(b"\n\n")[0].decode()
    assert "Segmentation_MasterRepresentation:=Binary labelmap" in head
    assert "Segment0_Name:=Body" in head
    assert "Segment0_LabelValue:=1" in head
    assert "Segment0_Extent:=2 6 3 7 1 4" in head
    assert "Segment1_Name:=Lesion" in head
    assert "Segment1_LabelValue:=2" in head

    with pytest.raises(ValueError):
        save_seg_nrrd(str(tmp_path / "bad.seg.nrrd"), {}, (1, 1, 1), (0, 0, 0))
    with pytest.raises(ValueError):
        save_seg_nrrd(str(tmp_path / "bad.seg.nrrd"),
                      {"A": body, "B": np.zeros((2, 2, 2), bool)}, (1, 1, 1), (0, 0, 0))


def test_seg_nrrd_reader_roundtrip(tmp_path):
    from mamri_tpu.perception.formats import load_seg_nrrd, save_seg_nrrd

    body = np.zeros((12, 10, 8), bool)
    body[2:7, 3:8, 1:5] = True
    lesion = np.zeros_like(body)
    lesion[8:10, 1:3, 6:8] = True
    p = str(tmp_path / "auto.seg.nrrd")
    save_seg_nrrd(p, {"Body": body, "Lesion": lesion},
                  spacing=(1.0, 1.5, 2.0), origin=(-3.0, 4.0, 5.0))
    segments, labelmap = load_seg_nrrd(p)
    assert list(segments) == ["Body", "Lesion"]
    np.testing.assert_array_equal(segments["Body"], body)
    np.testing.assert_array_equal(segments["Lesion"], lesion)
    np.testing.assert_array_equal(labelmap.data == 1.0, body)
    np.testing.assert_array_equal(labelmap.data == 2.0, lesion)
    np.testing.assert_allclose(labelmap.spacing, [1.0, 1.5, 2.0], atol=1e-6)
    np.testing.assert_allclose(labelmap.origin, [-3.0, 4.0, 5.0], atol=1e-6)


def test_seg_nrrd_4d_multilayer_overlap(tmp_path):
    """Slicer's 4-D layout: layer axis first with a 'none' space direction;
    overlapping segments live on different layers with per-layer labels."""
    from mamri_tpu.perception.formats import load_seg_nrrd

    nx, ny, nz = 5, 4, 3
    layer0 = np.zeros((nx, ny, nz), np.uint8)
    layer0[1:4, 1:3, :] = 1
    layer1 = np.zeros_like(layer0)
    layer1[2:5, 0:2, 1:3] = 1  # overlaps layer0 in [2:4, 1:2, 1:3]
    arr = np.stack([layer0, layer1], axis=0)  # (layer, x, y, z)
    hdr = (
        "NRRD0004\n"
        "type: unsigned char\n"
        "dimension: 4\n"
        "space: left-posterior-superior\n"
        f"sizes: 2 {nx} {ny} {nz}\n"
        "space directions: none (1,0,0) (0,1,0) (0,0,2)\n"
        "kinds: list domain domain domain\n"
        "encoding: gzip\n"
        "space origin: (1,2,3)\n"
        "Segmentation_MasterRepresentation:=Binary labelmap\n"
        "Segment0_Name:=Body\n"
        "Segment0_LabelValue:=1\n"
        "Segment0_Layer:=0\n"
        "Segment1_Name:=Tumor\n"
        "Segment1_LabelValue:=1\n"
        "Segment1_Layer:=1\n"
        "\n"
    ).encode()
    p = str(tmp_path / "multi.seg.nrrd")
    with open(p, "wb") as f:
        f.write(hdr + gzip.compress(arr.tobytes(order="F")))
    segments, labelmap = load_seg_nrrd(p)
    np.testing.assert_array_equal(segments["Body"], layer0 == 1)
    np.testing.assert_array_equal(segments["Tumor"], layer1 == 1)
    assert (segments["Body"] & segments["Tumor"]).any()  # overlap preserved
    np.testing.assert_allclose(labelmap.spacing, [1.0, 1.0, 2.0], atol=1e-6)


def test_seg_nrrd_plain_labelmap_and_oblique_rejected(tmp_path):
    from mamri_tpu.perception.formats import load_seg_nrrd

    lab = np.zeros((4, 4, 4), np.uint8)
    lab[0, 0, 0] = 3
    lab[2, 2, 2] = 7
    hdr = (
        "NRRD0004\ntype: unsigned char\ndimension: 3\nsizes: 4 4 4\n"
        "encoding: raw\n\n"
    ).encode()
    p = str(tmp_path / "plain.seg.nrrd")
    with open(p, "wb") as f:
        f.write(hdr + lab.tobytes(order="F"))
    segments, labelmap = load_seg_nrrd(p)
    assert set(segments) == {"Segment_3", "Segment_7"}
    assert segments["Segment_7"][2, 2, 2]

    c, s = np.cos(0.3), np.sin(0.3)
    hdr2 = (
        "NRRD0004\ntype: unsigned char\ndimension: 3\nsizes: 4 4 4\n"
        "space: left-posterior-superior\nencoding: raw\n"
        f"space directions: ({c},{s},0) ({-s},{c},0) (0,0,1)\n\n"
    ).encode()
    p2 = str(tmp_path / "obl.seg.nrrd")
    with open(p2, "wb") as f:
        f.write(hdr2 + lab.tobytes(order="F"))
    with pytest.raises(ValueError):
        load_seg_nrrd(p2)  # labels cannot be trilinearly resampled


def test_engine_set_body_segmentation(tmp_path):
    """A user-supplied .seg.nrrd replaces the body used by entry search (the
    reference's editable-segmentation workflow)."""
    from mamri_tpu.api import MamriEngine
    from mamri_tpu.perception.formats import save_seg_nrrd

    eng = MamriEngine()
    body = np.zeros((32, 32, 32), bool)
    x, y, z = np.mgrid[:32, :32, :32]
    body[(x - 16) ** 2 + (y - 16) ** 2 + (z - 16) ** 2 < 100] = True
    p = str(tmp_path / "body.seg.nrrd")
    save_seg_nrrd(p, {"Body": body}, spacing=(2.0, 2.0, 2.0), origin=(-32.0, -32.0, -32.0))
    eng.set_body_segmentation(p)
    np.testing.assert_array_equal(eng.body_mask(), body)
    ep = eng.find_entry_point(np.asarray([0.0, 0.0, 0.0], np.float32))
    assert bool(ep.found)

    with pytest.raises(ValueError):
        eng.set_body_segmentation(body)  # raw mask needs spacing/origin
    eng.set_body_segmentation(body, spacing=(1, 1, 1), origin=(0, 0, 0))
    assert eng.last_collision_world is None

    save_seg_nrrd(str(tmp_path / "two.seg.nrrd"), {"A": body, "B": ~body},
                  spacing=(1, 1, 1), origin=(0, 0, 0))
    with pytest.raises(ValueError):
        eng.set_body_segmentation(str(tmp_path / "two.seg.nrrd"))  # no 'Body'


def test_seg_nrrd_review_fixes(tmp_path):
    """Regressions from review: legacy 'spacings' honored in the seg reader,
    bad endian rejected, duplicate names kept, writer name validation,
    Path inputs to set_body_segmentation."""
    from pathlib import Path

    from mamri_tpu.api import MamriEngine
    from mamri_tpu.perception.formats import load_seg_nrrd, save_seg_nrrd

    lab = np.zeros((4, 4, 4), np.uint8)
    lab[1, 1, 1] = 1
    p = str(tmp_path / "legacy.seg.nrrd")
    with open(p, "wb") as f:
        f.write(b"NRRD0004\ntype: unsigned char\ndimension: 3\nsizes: 4 4 4\n"
                b"encoding: raw\nspacings: 2 2 2\n\n" + lab.tobytes(order="F"))
    _, labelmap = load_seg_nrrd(p)
    np.testing.assert_allclose(labelmap.spacing, [2.0, 2.0, 2.0])

    p2 = str(tmp_path / "endian.seg.nrrd")
    with open(p2, "wb") as f:
        f.write(b"NRRD0004\ntype: unsigned short\ndimension: 3\nsizes: 2 2 2\n"
                b"endian: l\nencoding: raw\n\n" + np.zeros((2, 2, 2), "<u2").tobytes())
    with pytest.raises(ValueError):
        load_seg_nrrd(p2)

    # duplicate segment names: both masks survive
    dup = (
        b"NRRD0004\ntype: unsigned char\ndimension: 3\nsizes: 4 4 4\n"
        b"encoding: raw\n"
        b"Segment0_Name:=Body\nSegment0_LabelValue:=1\n"
        b"Segment1_Name:=Body\nSegment1_LabelValue:=2\n\n"
    )
    lab2 = lab.copy()
    lab2[2, 2, 2] = 2
    p3 = str(tmp_path / "dup.seg.nrrd")
    with open(p3, "wb") as f:
        f.write(dup + lab2.tobytes(order="F"))
    segments, _ = load_seg_nrrd(p3)
    assert set(segments) == {"Body", "Body_1"}

    mask = np.zeros((2, 2, 2), bool)
    mask[0, 0, 0] = True
    for bad in ("", "a\nb", "Körper"):
        with pytest.raises(ValueError):
            save_seg_nrrd(str(tmp_path / "bad.seg.nrrd"), {bad: mask}, (1, 1, 1), (0, 0, 0))

    eng = MamriEngine()
    p4 = tmp_path / "body.seg.nrrd"
    save_seg_nrrd(str(p4), {"Body": mask}, (1, 1, 1), (0, 0, 0))
    eng.set_body_segmentation(Path(p4))  # PathLike accepted
    assert eng.body_mask().any()


def test_nrrd_dtype_encoding_roundtrip_matrix(tmp_path):
    """Handwritten files across the dtype x encoding matrix all decode to
    the same values (the writers only emit float32/gzip+raw; this pins the
    READER breadth independently)."""
    rng = np.random.default_rng(7)
    shape = (5, 6, 4)
    cases = [
        ("uchar", np.uint8), ("short", np.int16), ("ushort", np.uint16),
        ("int", np.int32), ("uint", np.uint32), ("float", np.float32),
        ("double", np.float64), ("int64", np.int64),
    ]
    for tname, dt in cases:
        info = np.iinfo(dt) if np.issubdtype(dt, np.integer) else None
        vals = rng.integers(0, min(info.max, 10_000) if info else 10_000,
                            size=shape).astype(dt)
        for enc in ("raw", "gzip", "ascii"):
            payload = vals.astype(np.dtype(dt).newbyteorder("<")).tobytes(order="F")
            if enc == "gzip":
                payload = gzip.compress(payload)
            elif enc == "ascii":
                payload = " ".join(str(x) for x in vals.flatten(order="F")).encode()
            hdr = (
                f"NRRD0004\ntype: {tname}\ndimension: 3\n"
                f"sizes: {shape[0]} {shape[1]} {shape[2]}\n"
                f"endian: little\nencoding: {enc}\n\n"
            ).encode()
            p = str(tmp_path / f"m_{tname}_{enc}.nrrd")
            with open(p, "wb") as f:
                f.write(hdr + payload)
            np.testing.assert_array_equal(
                load_nrrd(p).data, vals.astype(np.float32), err_msg=f"{tname}/{enc}"
            )


def test_compact_dtype_ingest_preserved(tmp_path):
    """Scanner-native integer files keep their storage dtype through load —
    the halved-H2D ingest path (the device pipeline casts to f32 on-chip):
    int16 NRRD stays int16, big-endian ushort MetaImage normalizes byte
    order only, and float data still normalizes to float32."""
    data = _asym_data((5, 4, 3), np.int16)
    hdr = (b"NRRD0004\ntype: short\ndimension: 3\nsizes: 5 4 3\n"
           b"endian: little\nencoding: raw\n\n")
    p = str(tmp_path / "c.nrrd")
    with open(p, "wb") as f:
        f.write(hdr + data.astype("<i2").tobytes(order="F"))
    v = load_nrrd(p)
    assert v.data.dtype == np.int16
    np.testing.assert_array_equal(v.data, data)

    du = _asym_data((4, 5, 6), np.uint16)
    mh = (b"ObjectType = Image\nNDims = 3\nBinaryData = True\n"
          b"BinaryDataByteOrderMSB = True\nCompressedData = False\n"
          b"DimSize = 4 5 6\nElementType = MET_USHORT\nElementDataFile = LOCAL\n")
    p2 = str(tmp_path / "c.mha")
    with open(p2, "wb") as f:
        f.write(mh + du.astype(">u2").tobytes(order="F"))
    v2 = load_metaimage(p2)
    assert v2.data.dtype == np.uint16
    assert v2.data.dtype.byteorder in ("=", "|", "<")  # native on LE hosts
    np.testing.assert_array_equal(v2.data, du)

    df = _asym_data((4, 3, 2), np.float64)
    hdrf = (b"NRRD0004\ntype: double\ndimension: 3\nsizes: 4 3 2\n"
            b"endian: little\nencoding: raw\n\n")
    p3 = str(tmp_path / "f.nrrd")
    with open(p3, "wb") as f:
        f.write(hdrf + df.astype("<f8").tobytes(order="F"))
    assert load_nrrd(p3).data.dtype == np.float32


def test_compact_dtype_writer_roundtrip(tmp_path):
    """The writers keep compact storage dtypes: an int16 volume writes as
    int16 (half the bytes) and loads back compact and bit-exact in every
    format; float volumes still write float32."""
    from mamri_tpu.perception.volume import Volume

    data = _asym_data((6, 5, 4), np.int16)
    v = Volume(data, np.array([1.0, 1.5, 2.0]), np.array([-3.0, 2.0, 5.0]))
    for name, save, load in (
        ("r.nrrd", save_nrrd, load_nrrd),
        ("r.mha", save_metaimage, load_metaimage),
        ("r.nii", save_nifti, load_nifti),
    ):
        p = str(tmp_path / name)
        save(p, v)
        back = load(p)
        assert back.data.dtype == np.int16, name
        np.testing.assert_array_equal(back.data, data)
        np.testing.assert_allclose(back.spacing, v.spacing, atol=1e-6)
        np.testing.assert_allclose(back.origin, v.origin, atol=1e-5)

    vf = Volume(data.astype(np.float32) + 0.5, v.spacing, v.origin)
    for name, save, load in (
        ("f.nrrd", save_nrrd, load_nrrd),
        ("f.mha", save_metaimage, load_metaimage),
        ("f.nii", save_nifti, load_nifti),
    ):
        p = str(tmp_path / name)
        save(p, vf)
        back = load(p)
        assert back.data.dtype == np.float32, name
        np.testing.assert_array_equal(back.data, vf.data)


def _nifti_int16_bytes(data, spacing=(1.0, 1.0, 1.0), slope=1.0, inter=0.0):
    nx, ny, nz = data.shape
    hdr = bytearray(352)
    struct.pack_into("<i", hdr, 0, 348)
    struct.pack_into("<8h", hdr, 40, 3, nx, ny, nz, 1, 1, 1, 1)
    struct.pack_into("<h", hdr, 70, 4)  # DT_INT16
    struct.pack_into("<h", hdr, 72, 16)  # bitpix
    struct.pack_into("<8f", hdr, 76, 1.0, *spacing, 1.0, 1.0, 1.0, 1.0)
    struct.pack_into("<f", hdr, 108, 352.0)  # vox_offset
    struct.pack_into("<f", hdr, 112, slope)
    struct.pack_into("<f", hdr, 116, inter)
    struct.pack_into("<h", hdr, 254, 1)  # sform_code
    sx, sy, sz = spacing
    # RAS srow rows negated in x,y -> identity LPS affine (no flips)
    struct.pack_into("<4f", hdr, 280, -sx, 0.0, 0.0, 0.0)
    struct.pack_into("<4f", hdr, 296, 0.0, -sy, 0.0, 0.0)
    struct.pack_into("<4f", hdr, 312, 0.0, 0.0, sz, 0.0)
    hdr[344:348] = b"n+1\x00"
    return bytes(hdr) + data.astype("<i2").tobytes(order="F")


def test_nifti_int16_identity_rescale_preserved(tmp_path):
    """int16 NIfTI with identity scl keeps int16 storage; a real rescale
    still applies in float32 exactly as before."""
    data = _asym_data((5, 4, 3), np.int16)
    p = str(tmp_path / "i16.nii")
    with open(p, "wb") as f:
        f.write(_nifti_int16_bytes(data))
    v = load_nifti(p)
    assert v.data.dtype == np.int16
    np.testing.assert_array_equal(v.data, data)

    p2 = str(tmp_path / "scaled.nii")
    with open(p2, "wb") as f:
        f.write(_nifti_int16_bytes(data, slope=2.0, inter=10.0))
    v2 = load_nifti(p2)
    assert v2.data.dtype == np.float32
    np.testing.assert_array_equal(v2.data, data.astype(np.float32) * 2.0 + 10.0)


def test_format_header_fuzz_never_crashes(tmp_path):
    """Random single-byte corruption of NRRD/MetaImage headers either still
    loads or raises ValueError/OSError — never an unhandled exception type
    (the CLI's error contract). Mirrors the DICOM codecs' byte-flip fuzz."""
    v = synthetic_volume(shape=(6, 5, 4), spacing=(1.0, 1.0, 2.0))
    seeds = {
        "f.nrrd": (save_nrrd, load_nrrd),
        "f.mha": (save_metaimage, load_metaimage),
    }
    rng = np.random.default_rng(11)
    for name, (saver, loader) in seeds.items():
        p = str(tmp_path / name)
        saver(p, v)
        good = open(p, "rb").read()
        header_len = good.index(b"\n\n") + 2 if name.endswith(".nrrd") else good.index(b"LOCAL\n") + 6
        for trial in range(120):
            buf = bytearray(good)
            pos = int(rng.integers(0, header_len))
            buf[pos] = int(rng.integers(0, 256))
            q = str(tmp_path / f"fz_{name}")
            with open(q, "wb") as f:
                f.write(bytes(buf))
            try:
                loader(q)
            except (ValueError, OSError):
                pass  # structured rejection is fine
