import gzip
import struct

import numpy as np
import pytest

from vsn_tpu.utils import nifti


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.float32, np.int16, np.uint8, np.float64])
def test_roundtrip(tmp_path, suffix, dtype):
    rng = np.random.default_rng(0)
    if np.issubdtype(dtype, np.integer):
        data = rng.integers(0, 100, (5, 6, 7)).astype(dtype)
    else:
        data = rng.standard_normal((5, 6, 7)).astype(dtype)
    path = tmp_path / f"x{suffix}"
    nifti.save(data, path)
    img = nifti.load(path)
    assert img.shape == (5, 6, 7)
    np.testing.assert_allclose(img.get_fdata(), data.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(img.affine, np.eye(4))


def test_affine_roundtrip(tmp_path):
    aff = np.array(
        [[2.0, 0, 0, -10], [0, 1.5, 0, 5], [0, 0, 1.0, 0], [0, 0, 0, 1]]
    )
    data = np.zeros((3, 3, 3), np.float32)
    nifti.save(data, tmp_path / "a.nii", affine=aff)
    img = nifti.load(tmp_path / "a.nii")
    np.testing.assert_allclose(img.affine, aff)


def test_scl_slope_inter(tmp_path):
    # hand-craft a file with scaling
    data = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    path = tmp_path / "s.nii"
    nifti.save(data, path)
    raw = bytearray(path.read_bytes())
    struct.pack_into("<f", raw, 112, 2.0)   # scl_slope
    struct.pack_into("<f", raw, 116, 1.0)   # scl_inter
    path.write_bytes(bytes(raw))
    img = nifti.load(path)
    np.testing.assert_allclose(
        img.get_fdata(), data.astype(np.float32) * 2 + 1
    )


def test_fortran_order_matches_spec(tmp_path):
    """Voxel (i, j, k) must be stored at offset i + j*ni + k*ni*nj."""
    data = np.zeros((2, 3, 4), np.float32)
    data[1, 2, 3] = 42.0
    path = tmp_path / "f.nii"
    nifti.save(data, path)
    raw = path.read_bytes()
    vox = np.frombuffer(raw[352:], np.float32)
    ni, nj = 2, 3
    assert vox[1 + 2 * ni + 3 * ni * nj] == 42.0


def test_bad_files(tmp_path):
    p = tmp_path / "bad.nii"
    p.write_bytes(b"\x00" * 100)
    with pytest.raises(ValueError, match="truncated"):
        nifti.load(p)
    p2 = tmp_path / "bad2.nii"
    p2.write_bytes(b"\x00" * 400)
    with pytest.raises(ValueError, match="not a NIfTI-1"):
        nifti.load(p2)
