"""Native C++ runtime tests (lazy g++ build, ctypes ABI)."""

import struct

import numpy as np
import pytest
from scipy import ndimage

from mamri_tpu import native
from mamri_tpu.utils.stl import load_stl, sample_surface_points

pytestmark = pytest.mark.skipif(not native.available(), reason="native toolchain unavailable")


def _write_binary_stl(path, tris):
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(tris)))
        for t in tris:
            f.write(struct.pack("<3f", 0.0, 0.0, 0.0))  # normal
            for v in t:
                f.write(struct.pack("<3f", *v))
            f.write(struct.pack("<H", 0))


def test_native_stl_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tris = rng.uniform(-50, 50, size=(37, 3, 3)).astype(np.float32)
    p = str(tmp_path / "part.stl")
    _write_binary_stl(p, tris)
    got = native.parse_stl_native(p)
    np.testing.assert_allclose(got, tris, atol=0)
    # the public loader routes binary files through the native parser
    got2 = load_stl(p)
    np.testing.assert_allclose(got2, tris, atol=0)
    pts = sample_surface_points(got2, 256)
    assert pts.shape == (256, 3)


def test_native_stl_missing_file():
    assert native.parse_stl_native("/nonexistent/file.stl") is None


def test_native_ccl_matches_scipy():
    rng = np.random.default_rng(1)
    mask = rng.random((24, 30, 18)) > 0.55
    labels, k = native.label_components_native(mask)
    s_labels, s_k = ndimage.label(mask, structure=ndimage.generate_binary_structure(3, 1))
    assert k == s_k
    # identical partition
    for lbl in range(1, s_k + 1):
        sel = s_labels == lbl
        vals = np.unique(labels[sel])
        assert len(vals) == 1 and vals[0] > 0
    assert np.all((labels > 0) == mask)


def test_native_ccl_itk_raster_order():
    """Component numbering follows first-voxel (z,y,x) raster order."""
    mask = np.zeros((8, 8, 8), dtype=bool)
    mask[6, 6, 1] = True  # first in z-raster (k=1)
    mask[0, 0, 5] = True  # later (k=5)
    labels, k = native.label_components_native(mask)
    assert k == 2
    assert labels[6, 6, 1] == 1
    assert labels[0, 0, 5] == 2


def test_stl_writer_roundtrip(tmp_path):
    from mamri_tpu.utils.stl import save_stl, load_stl, transform_triangles

    rng = np.random.default_rng(5)
    tris = rng.uniform(-20, 20, size=(11, 3, 3)).astype(np.float32)
    p = str(tmp_path / "out.stl")
    save_stl(p, tris)
    back = load_stl(p)
    np.testing.assert_allclose(back, tris, atol=0)
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = [10, -5, 3]
    moved = transform_triangles(tris, m)
    np.testing.assert_allclose(moved, tris + np.array([10, -5, 3], dtype=np.float32), atol=1e-5)


def test_packbits_native_matches_python():
    """The C codec must be byte-identical to the Python fallback on both
    encode and decode (the DICOM RLE ingest path dispatches to it)."""
    import numpy as np
    import pytest

    from mamri_tpu import native

    if not native.available():
        pytest.skip("native toolchain unavailable")

    # pure-Python copies of the fallbacks (the module functions dispatch to
    # native when available, so reimplement the reference loop here)
    def py_decode(data, expected):
        out = bytearray()
        i = 0
        while i < len(data) and len(out) < expected:
            c = data[i]; i += 1
            if c < 128:
                out += data[i : i + c + 1]; i += c + 1
            elif c > 128:
                out += bytes([data[i]]) * (257 - c); i += 1
        assert len(out) >= expected
        return bytes(out[:expected])

    rng = np.random.default_rng(3)
    cases = [
        b"", b"\x07", b"\x00" * 1000, bytes(range(256)) * 3, b"xy" * 300,
        rng.integers(0, 256, 5000).astype(np.uint8).tobytes(),
        rng.integers(0, 2, 5000).astype(np.uint8).tobytes(),
    ]
    from mamri_tpu.native import packbits_decode_native, packbits_encode_native

    for seg in cases:
        enc = packbits_encode_native(seg)
        assert enc is not None
        assert py_decode(enc, len(seg)) == seg
        assert packbits_decode_native(enc, len(seg)) == seg
    # truncated input raises like the Python path
    with pytest.raises(ValueError):
        packbits_decode_native(b"\x7f\x01", 100)
