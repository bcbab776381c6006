"""Lossy sequential-DCT JPEG (.50/.51): libjpeg interop + DICOM wiring.

Old MR archives ship 12-bit extended-sequential (.51) lossy JPEG; the
reference decodes it through Slicer's DICOM stack
(/root/reference/Mamri/Mamri.py:1306). Decode is validated against
libjpeg (via Pillow and OpenCV) within the 1-LSB IDCT tolerance T.81
allows; the encoder is the self-test counterpart.
"""

import io
import os
import struct
import tempfile

import numpy as np
import pytest

from mamri_tpu.perception import jpegdct as J

PIL_Image = pytest.importorskip("PIL.Image", reason="libjpeg interop oracle")


def _img8(rng, shape=(96, 112)):
    yy, xx = np.mgrid[: shape[0], : shape[1]]
    return np.clip(
        120 + 60 * np.sin(yy / 11.0) * np.cos(xx / 9.0) + rng.normal(0, 5, shape), 0, 255
    ).astype(np.uint8)


def test_decode_libjpeg_streams_within_idct_tolerance():
    rng = np.random.default_rng(2)
    img = _img8(rng)
    for q in (95, 80, 50):
        buf = io.BytesIO()
        PIL_Image.fromarray(img, "L").save(buf, format="JPEG", quality=q)
        ours, prec = J.decode_jpeg_dct(buf.getvalue())
        assert prec == 8
        pil = np.array(PIL_Image.open(buf)).astype(np.int64)
        assert np.abs(ours.astype(np.int64) - pil).max() <= 1


def test_libjpeg_decodes_our_streams():
    rng = np.random.default_rng(2)
    img = _img8(rng)
    data = J.encode_jpeg_dct(img.astype(np.int32), 8, quality=85)
    pil = np.array(PIL_Image.open(io.BytesIO(data))).astype(np.int64)
    ours, _ = J.decode_jpeg_dct(data)
    assert np.abs(ours.astype(np.int64) - pil).max() <= 1
    # fidelity sanity at high quality (source has sigma-5 noise)
    assert np.sqrt(((ours.astype(float) - img) ** 2).mean()) < 5.0


def test_restart_marker_streams():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(2)
    img = _img8(rng)
    ok, enc = cv2.imencode(
        ".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 90, cv2.IMWRITE_JPEG_RST_INTERVAL, 4]
    )
    assert ok
    ours, _ = J.decode_jpeg_dct(enc.tobytes())
    ref = cv2.imdecode(enc, cv2.IMREAD_UNCHANGED).astype(np.int64)
    assert np.abs(ours.astype(np.int64) - ref).max() <= 1


def test_12bit_extended_roundtrip():
    rng = np.random.default_rng(4)
    yy, xx = np.mgrid[:64, :72]
    img = np.clip(1800 + 900 * np.sin(yy / 13.0) + rng.normal(0, 40, (64, 72)), 0, 4095).astype(np.int32)
    for q in (95, 75):
        data = J.encode_jpeg_dct(img, 12, quality=q)
        back, prec = J.decode_jpeg_dct(data)
        assert prec == 12
        rms = np.sqrt(((back.astype(float) - img) ** 2).mean())
        assert rms < 4096 * 0.02, rms  # lossy but sane
    with pytest.raises(ValueError):
        J.encode_jpeg_dct(img, 8)  # 12-bit samples exceed 8-bit precision


def test_rejections_and_fuzz():
    rng = np.random.default_rng(6)
    img = _img8(rng, (24, 40))
    good = J.encode_jpeg_dct(img.astype(np.int32), 8, quality=80)
    # progressive streams are rejected loudly
    buf = io.BytesIO()
    PIL_Image.fromarray(img, "L").save(buf, format="JPEG", quality=80, progressive=True)
    with pytest.raises(ValueError, match="sequential|SOF"):
        J.decode_jpeg_dct(buf.getvalue())
    # multi-component (RGB) is rejected
    rgb = np.stack([img] * 3, -1)
    buf = io.BytesIO()
    PIL_Image.fromarray(rgb).save(buf, format="JPEG", quality=80)
    with pytest.raises(ValueError, match="component"):
        J.decode_jpeg_dct(buf.getvalue())
    for trial in range(120):
        data = bytearray(good)
        for _ in range(int(rng.integers(1, 4))):
            data[int(rng.integers(0, len(data)))] = int(rng.integers(0, 256))
        try:
            J.decode_jpeg_dct(bytes(data))
        except ValueError:
            pass
        except (IndexError, KeyError, MemoryError, OverflowError, ZeroDivisionError, struct.error) as e:
            raise AssertionError(f"trial {trial}: {type(e).__name__}: {e}")
    for cut in (2, 9, len(good) // 2):
        try:
            J.decode_jpeg_dct(good[:cut])
        except ValueError:
            pass


def test_dicom_51_extended_jpeg_loads():
    """A 12-bit .51 file assembles into a Volume whose frame equals the
    direct codec decode (rescale identity here)."""
    import mamri_tpu.perception.dicom as D
    from mamri_tpu.perception.dicom import load_dicom_series

    rng = np.random.default_rng(9)
    yy, _ = np.mgrid[:32, :24]
    img = np.clip(1000 + 500 * np.sin(yy / 7.0) + rng.normal(0, 30, (32, 24)), 0, 4095).astype(np.int32)
    frame = J.encode_jpeg_dct(img, 12, quality=95)
    if len(frame) % 2:
        frame += b"\x00"
    expected, _ = J.decode_jpeg_dct(frame)

    def el16(g, e, v):
        return D._el(g, e, b"US", struct.pack("<H", v))

    body = b"".join([
        D._el(0x0008, 0x0016, b"UI", D._MR_STORAGE.encode()),
        D._el(0x0008, 0x0018, b"UI", b"1.2.3.4"),
        D._el(0x0020, 0x000E, b"UI", b"1.2.3"),
        D._el(0x0020, 0x0032, b"DS", D._ds([0, 0, 0])),
        D._el(0x0020, 0x0037, b"DS", D._ds([1, 0, 0, 0, 1, 0])),
        el16(0x0028, 0x0002, 1), el16(0x0028, 0x0010, 32), el16(0x0028, 0x0011, 24),
        D._el(0x0028, 0x0030, b"DS", D._ds([1.0, 1.0])),
        el16(0x0028, 0x0100, 16), el16(0x0028, 0x0101, 12),
        el16(0x0028, 0x0102, 11), el16(0x0028, 0x0103, 0),
        D._encapsulate([frame]),
    ])
    meta_body = b"".join([
        D._el(0x0002, 0x0001, b"OB", b"\x00\x01"),
        D._el(0x0002, 0x0002, b"UI", D._MR_STORAGE.encode()),
        D._el(0x0002, 0x0003, b"UI", b"1.2.3.4"),
        D._el(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.4.51"),
    ])
    meta = D._el(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_body))) + meta_body
    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "f.dcm"), "wb") as f:
            f.write(b"\x00" * 128 + b"DICM" + meta + body)
        vol = load_dicom_series(d)
        got = np.asarray(vol.data)[:, :, 0].T
        np.testing.assert_array_equal(got, expected.astype(np.float32))
        # .50 with a 12-bit stream inside must be refused
        bad_meta_body = meta_body.replace(b"1.2.840.10008.1.2.4.51", b"1.2.840.10008.1.2.4.50")
        bad_meta = D._el(0x0002, 0x0000, b"UL", struct.pack("<I", len(bad_meta_body))) + bad_meta_body
        with open(os.path.join(d, "f.dcm"), "wb") as f:
            f.write(b"\x00" * 128 + b"DICM" + bad_meta + body)
        with pytest.raises(ValueError, match="8-bit|no readable"):
            load_dicom_series(d)


def test_native_scan_parity_and_fuzz():
    from mamri_tpu import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(31)
    img = _img8(rng, (48, 56))
    good = J.encode_jpeg_dct(img.astype(np.int32), 8, quality=80)
    a, _ = J.decode_jpeg_dct(good, use_native=False)
    b, _ = J.decode_jpeg_dct(good, use_native=True)
    np.testing.assert_array_equal(a, b)
    for _ in range(60):
        data = bytearray(good)
        data[int(rng.integers(0, len(data)))] = int(rng.integers(0, 256))
        try:
            x = J.decode_jpeg_dct(bytes(data), use_native=True)[0]
        except ValueError:
            x = None
        try:
            y = J.decode_jpeg_dct(bytes(data), use_native=False)[0]
        except ValueError:
            y = None
        # both paths must agree whenever both decode (accept/reject may
        # differ on corrupt streams: the native scan validates stripes the
        # Python loop tolerates and vice versa — samples must never diverge)
        if x is not None and y is not None:
            np.testing.assert_array_equal(x, y)


def test_hufftable_rejects_code_space_overflow():
    """A DHT whose counts overflow the canonical code space must be rejected
    by the Python table builder, mirroring the native JdctHuff.build check
    (ADVICE r3: native/oracle divergence on corrupt input)."""
    bits = [3] + [0] * 15  # three codes of length 1 in a 2-code space
    with pytest.raises(J.JpegDctError):
        J._HuffTable(bits, [0, 1, 2])
    # a maximal-but-valid table still builds
    J._HuffTable([2] + [0] * 15, [0, 1])


def test_jpegll_native_emit_cap_falls_back():
    """Native emit returns None (Python fallback) instead of raising when the
    output cap is exceeded (ADVICE r3). Exercised by calling the wrapper with
    a deliberately adversarial all-max stream."""
    from mamri_tpu.native import jpegll_emit_native

    n = 64
    diffs = np.full(n, 65535, dtype=np.int32)
    cats = np.full(n, 16, dtype=np.uint8)
    codes = np.zeros(17, dtype=np.uint32)
    lens = np.zeros(17, dtype=np.uint8)
    # give category 16 a 16-bit all-ones code: every emitted byte is FF ->
    # maximal stuffing; the 8 B/sample cap must still hold (no None, no raise)
    codes[16] = 0xFFFE
    lens[16] = 16
    out = jpegll_emit_native(diffs, cats, codes, lens)
    if out is not None:  # native lib present
        assert len(out) <= n * 8 + 16
