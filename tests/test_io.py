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
