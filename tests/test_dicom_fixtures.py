"""External DICOM container fixtures (VERDICT r3 #5).

The codec layers have external oracles (Pillow/OpenJPEG/OpenCV); the DICOM
*container* parser was previously tested only against files this repo itself
writes. These fixtures are built by a minimal standalone writer implemented
here DIRECTLY FROM PS3.10/PS3.5 (file meta, explicit/implicit VR, big endian,
deflated, undefined-length functional-group sequences) — deliberately sharing
no code or structural choices with `perception/dicom.py`'s writer (which
emits defined-length sequences), so `load_dicom`/`load_dicom_series` are
checked against an independent byte-level encoding of the standard, the same
wire format Slicer/GDCM ingest feeds the reference (Mamri/Mamri.py:1306).
"""

import struct
import zlib

import numpy as np
import pytest

from mamri_tpu.perception.dicom import load_dicom, load_dicom_series

_EXPL_LE = "1.2.840.10008.1.2.1"
_IMPL_LE = "1.2.840.10008.1.2"
_EXPL_BE = "1.2.840.10008.1.2.2"
_DEFL_LE = "1.2.840.10008.1.2.1.99"

_LONG_VRS = (b"OB", b"OW", b"SQ", b"UN", b"UT")


def _pad(vr: bytes, value: bytes) -> bytes:
    if len(value) % 2:
        value += b"\x00" if vr in (b"UI", b"OB", b"OW") else b" "
    return value


def _el(tag, vr: bytes, value: bytes, explicit=True, be=False) -> bytes:
    e = ">" if be else "<"
    value = _pad(vr, value)
    head = struct.pack(e + "HH", tag[0], tag[1])
    if not explicit:
        return head + struct.pack(e + "I", len(value)) + value
    if vr in _LONG_VRS:
        return head + vr + struct.pack(e + "HI", 0, len(value)) + value
    return head + vr + struct.pack(e + "H", len(value)) + value


def _ds(vals) -> bytes:
    return "\\".join(f"{float(v):g}" for v in np.atleast_1d(vals)).encode()


def _item(body: bytes, undefined=False, be=False) -> bytes:
    e = ">" if be else "<"
    if undefined:
        return (
            struct.pack(e + "HHI", 0xFFFE, 0xE000, 0xFFFFFFFF)
            + body
            + struct.pack(e + "HHI", 0xFFFE, 0xE00D, 0)
        )
    return struct.pack(e + "HHI", 0xFFFE, 0xE000, len(body)) + body


def _sq_undefined(tag, items, explicit=True, be=False) -> bytes:
    """Undefined-length SQ (PS3.5 7.5.2) — a structure the repo's own writer
    never produces (it emits defined lengths), keeping this oracle's byte
    stream independent."""
    e = ">" if be else "<"
    body = b"".join(items) + struct.pack(e + "HHI", 0xFFFE, 0xE0DD, 0)
    head = struct.pack(e + "HH", tag[0], tag[1])
    if explicit:
        return head + b"SQ" + struct.pack(e + "HI", 0, 0xFFFFFFFF) + body
    return head + struct.pack(e + "I", 0xFFFFFFFF) + body


def _file_meta(ts: str, sop_class="1.2.840.10008.5.1.4.1.1.4", inst="1.2.3.4.5") -> bytes:
    body = (
        _el((0x0002, 0x0001), b"OB", b"\x00\x01")
        + _el((0x0002, 0x0002), b"UI", sop_class.encode())
        + _el((0x0002, 0x0003), b"UI", inst.encode())
        + _el((0x0002, 0x0010), b"UI", ts.encode())
        + _el((0x0002, 0x0012), b"UI", b"1.2.826.0.1.3680043.8.498.1")
    )
    return (
        b"\x00" * 128
        + b"DICM"
        + _el((0x0002, 0x0000), b"UL", struct.pack("<I", len(body)))
        + body
    )


def _classic_slice(
    ts, pix, ipp, iop=(1, 0, 0, 0, 1, 0), spacing_rc=(0.75, 1.25),
    series="9.8.7.6", signed=True, slope=None, intercept=None, instance="1.1",
) -> bytes:
    """One classic MR slice; `pix` is (rows, cols) int16/uint16."""
    explicit = ts != _IMPL_LE
    be = ts == _EXPL_BE
    rows, cols = pix.shape
    dt = (">i2" if signed else ">u2") if be else ("<i2" if signed else "<u2")
    e = ">" if be else "<"

    def el(tag, vr, value):
        return _el(tag, vr, value, explicit=explicit, be=be)

    body = (
        el((0x0008, 0x0016), b"UI", b"1.2.840.10008.5.1.4.1.1.4")
        + el((0x0008, 0x0018), b"UI", instance.encode())
        + el((0x0020, 0x000D), b"UI", b"5.5.5.5")
        + el((0x0020, 0x000E), b"UI", series.encode())
        + el((0x0020, 0x0032), b"DS", _ds(ipp))
        + el((0x0020, 0x0037), b"DS", _ds(iop))
        + el((0x0028, 0x0002), b"US", struct.pack(e + "H", 1))
        + el((0x0028, 0x0004), b"CS", b"MONOCHROME2")
        + el((0x0028, 0x0010), b"US", struct.pack(e + "H", rows))
        + el((0x0028, 0x0011), b"US", struct.pack(e + "H", cols))
        + el((0x0028, 0x0030), b"DS", _ds(spacing_rc))
        + el((0x0028, 0x0100), b"US", struct.pack(e + "H", 16))
        + el((0x0028, 0x0101), b"US", struct.pack(e + "H", 16))
        + el((0x0028, 0x0102), b"US", struct.pack(e + "H", 15))
        + el((0x0028, 0x0103), b"US", struct.pack(e + "H", 1 if signed else 0))
    )
    if slope is not None:
        body += el((0x0028, 0x1053), b"DS", _ds([slope]))
    if intercept is not None:
        body += el((0x0028, 0x1052), b"DS", _ds([intercept]))
    body += el((0x7FE0, 0x0010), b"OW", np.ascontiguousarray(pix, dtype=dt).tobytes())
    if ts == _DEFL_LE:
        comp = zlib.compressobj(wbits=-15)
        body = comp.compress(body) + comp.flush()
    return _file_meta(ts, inst=instance) + body


def _pix(rows, cols, seed, signed=True):
    rng = np.random.default_rng(seed)
    if signed:
        return rng.integers(-3000, 3000, size=(rows, cols)).astype(np.int16)
    return rng.integers(0, 4000, size=(rows, cols)).astype(np.uint16)


@pytest.mark.parametrize("ts", [_EXPL_LE, _IMPL_LE, _EXPL_BE, _DEFL_LE])
def test_classic_series_four_syntaxes(tmp_path, ts):
    """A 4-slice classic MR series in each uncompressed transfer syntax:
    pixels bit-exact, geometry (spacing/origin) exact, slices sorted by IPP
    projection even when written out of order."""
    rows, cols, n = 7, 9, 4
    step = 2.5
    pix = [_pix(rows, cols, 100 + k) for k in range(n)]
    order = [2, 0, 3, 1]  # written shuffled; the loader must sort
    d = tmp_path / ts.replace(".", "_")
    d.mkdir()
    for fi, k in enumerate(order):
        blob = _classic_slice(
            ts, pix[k], ipp=(-40.0, -50.0, 10.0 + step * k), instance=f"1.{k}"
        )
        (d / f"slice{fi}.dcm").write_bytes(blob)
    vol = load_dicom_series(str(d))
    # data layout: (cols, rows, slices); spacing (dc, dr, step); origin ipp0
    assert vol.data.shape == (cols, rows, n)
    # no RescaleSlope/Intercept in these fixtures: the scanner's int16
    # storage dtype is preserved (compact H2D ingest; device casts on-chip)
    assert vol.data.dtype == np.int16
    np.testing.assert_allclose(np.asarray(vol.spacing), [1.25, 0.75, 2.5], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(vol.origin), [-40.0, -50.0, 10.0], atol=1e-6)
    for k in range(n):
        np.testing.assert_array_equal(
            np.asarray(vol.data)[:, :, k], pix[k].astype(np.float32).T
        )


def test_classic_single_file_rescale_and_unsigned(tmp_path):
    """Single-file load path: unsigned pixels + RescaleSlope/Intercept applied."""
    pix = _pix(5, 6, 7, signed=False)
    p = tmp_path / "one.dcm"
    p.write_bytes(
        _classic_slice(_EXPL_LE, pix, ipp=(1.0, 2.0, 3.0), signed=False,
                       slope=2.0, intercept=-1024.0)
    )
    vol = load_dicom(str(p))
    np.testing.assert_array_equal(
        np.asarray(vol.data)[:, :, 0], (pix.astype(np.float32) * 2.0 - 1024.0).T
    )
    np.testing.assert_allclose(np.asarray(vol.origin), [1.0, 2.0, 3.0], atol=1e-6)


def test_enhanced_multiframe_undefined_length_sequences(tmp_path):
    """Enhanced MR: geometry lives ONLY in functional groups, encoded as
    undefined-length sequences with undefined-length items (a GDCM-style
    structural variant the repo's writer never emits); per-frame
    PlanePosition, shared PlaneOrientation/PixelMeasures, shared rescale."""
    rows, cols, n = 6, 8, 3
    pix = [_pix(rows, cols, 200 + k) for k in range(n)]
    e = "<"

    def el(tag, vr, value):
        return _el(tag, vr, value)

    shared_item = _item(
        _sq_undefined(
            (0x0028, 0x9110),
            [_item(
                el((0x0018, 0x0088), b"DS", _ds([4.0]))
                + el((0x0028, 0x0030), b"DS", _ds([0.5, 2.0])),
                undefined=True,
            )],
        )
        + _sq_undefined(
            (0x0020, 0x9116),
            [_item(el((0x0020, 0x0037), b"DS", _ds([1, 0, 0, 0, 1, 0])))],
        )
        + _sq_undefined(
            (0x0028, 0x9145),
            [_item(
                el((0x0028, 0x1052), b"DS", _ds([-100.0]))
                + el((0x0028, 0x1053), b"DS", _ds([3.0]))
            )],
        ),
        undefined=True,
    )
    frame_items = [
        _item(
            _sq_undefined(
                (0x0020, 0x9113),
                [_item(el((0x0020, 0x0032), b"DS", _ds([-10.0, -20.0, 5.0 + 4.0 * k])),
                       undefined=True)],
            )
        )
        for k in range(n)
    ]
    body = (
        el((0x0008, 0x0016), b"UI", b"1.2.840.10008.5.1.4.1.1.4.1")
        + el((0x0008, 0x0018), b"UI", b"2.2")
        + el((0x0020, 0x000E), b"UI", b"9.9.9.9")
        + el((0x0028, 0x0008), b"IS", str(n).encode())
        + el((0x0028, 0x0010), b"US", struct.pack(e + "H", rows))
        + el((0x0028, 0x0011), b"US", struct.pack(e + "H", cols))
        + el((0x0028, 0x0100), b"US", struct.pack(e + "H", 16))
        + el((0x0028, 0x0101), b"US", struct.pack(e + "H", 16))
        + el((0x0028, 0x0102), b"US", struct.pack(e + "H", 15))
        + el((0x0028, 0x0103), b"US", struct.pack(e + "H", 1))
        + _sq_undefined((0x5200, 0x9229), [shared_item])
        + _sq_undefined((0x5200, 0x9230), frame_items)
        + el(
            (0x7FE0, 0x0010), b"OW",
            b"".join(np.ascontiguousarray(p, dtype="<i2").tobytes() for p in pix),
        )
    )
    path = tmp_path / "enh.dcm"
    path.write_bytes(
        _file_meta(_EXPL_LE, sop_class="1.2.840.10008.5.1.4.1.1.4.1", inst="2.2") + body
    )
    vol = load_dicom(str(path))
    assert vol.data.shape == (cols, rows, n)
    np.testing.assert_allclose(np.asarray(vol.spacing), [2.0, 0.5, 4.0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(vol.origin), [-10.0, -20.0, 5.0], atol=1e-6)
    for k in range(n):
        np.testing.assert_array_equal(
            np.asarray(vol.data)[:, :, k],
            (pix[k].astype(np.float32) * 3.0 - 100.0).T,
        )


def test_mixed_series_largest_wins_and_uid_selection(tmp_path):
    """Two series in one directory: default picks the larger; series_uid
    selects explicitly; a non-DICOM file in the directory is skipped."""
    d = tmp_path / "mix"
    d.mkdir()
    big = [_pix(4, 4, 300 + k) for k in range(3)]
    small = [_pix(4, 4, 400)]
    for k, p in enumerate(big):
        (d / f"a{k}.dcm").write_bytes(
            _classic_slice(_EXPL_LE, p, ipp=(0, 0, k * 1.5), series="1.1.1.1",
                           instance=f"3.{k}")
        )
    (d / "b0.dcm").write_bytes(
        _classic_slice(_EXPL_LE, small[0], ipp=(0, 0, 0), series="2.2.2.2",
                       instance="4.0")
    )
    (d / "notes.txt").write_bytes(b"not a dicom file")
    vol = load_dicom_series(str(d))
    assert vol.data.shape[2] == 3
    vol_small = load_dicom_series(str(d), series_uid="2.2.2.2")
    assert vol_small.data.shape[2] == 1
    np.testing.assert_array_equal(
        np.asarray(vol_small.data)[:, :, 0], small[0].astype(np.float32).T
    )


def test_truncated_and_corrupt_fixtures_rejected(tmp_path):
    """Byte-level damage must surface as ValueError, not garbage volumes."""
    pix = _pix(4, 5, 11)
    good = _classic_slice(_EXPL_LE, pix, ipp=(0, 0, 0))
    trunc = tmp_path / "trunc.dcm"
    trunc.write_bytes(good[: len(good) - pix.size])  # half the pixel data gone
    with pytest.raises(ValueError):
        load_dicom(str(trunc))
    bad_ts = tmp_path / "badts.dcm"
    bad_ts.write_bytes(
        good.replace(_EXPL_LE.encode() + b"\x00", b"1.2.840.10008.1.2.4.99\x00", 1)
    )
    with pytest.raises(ValueError):
        load_dicom(str(bad_ts))
