"""prepare_kitti: crop PLY (with per-vertex label) -> evaluator layout."""

import numpy as np
import pytest

from point_sam_tpu.evalsuite.prepare_kitti import (
    KITTI_ROTATION,
    prepare_crop,
)
from point_sam_tpu.utils.ply import load_ply


def write_crop_ply(path, xyz, rgb, label):
    """Binary PLY with x/y/z float, R/G/B uchar, label int32 (the AGILE3D
    crop layout the reference's read_ply parses, eval_kitti.py:335-346)."""
    n = len(xyz)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar R\nproperty uchar G\nproperty uchar B\n"
        "property int label\nend_header\n"
    )
    rec = np.empty(n, dtype=np.dtype(
        [("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
         ("R", "u1"), ("G", "u1"), ("B", "u1"), ("label", "<i4")]))
    rec["x"], rec["y"], rec["z"] = xyz.T
    rec["R"], rec["G"], rec["B"] = rgb.T
    rec["label"] = label
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(rec.tobytes())


@pytest.fixture()
def crop(tmp_path, rng):
    xyz = rng.standard_normal((500, 3)).astype(np.float32)
    rgb = rng.integers(0, 256, (500, 3)).astype(np.uint8)
    label = np.zeros(500, np.int32)
    label[:120] = 1
    p = tmp_path / "car_0.ply"
    write_crop_ply(p, xyz, rgb, label)
    return p, xyz, rgb, label


def test_prepare_crop_rotation_and_masks(crop, tmp_path):
    src, xyz, rgb, label = crop
    out_dir = tmp_path / "out"
    out_ply = prepare_crop(src, out_dir)
    xyz2, rgb2 = load_ply(out_ply)
    # fixed xyz(-90,180,0) rotation applied (eval_kitti.py:19)
    np.testing.assert_allclose(xyz2, (xyz @ KITTI_ROTATION.T), atol=1e-5)
    np.testing.assert_array_equal(rgb2, rgb)
    masks = np.load(out_ply.with_suffix(".masks.npy"))
    assert masks.shape == (1, 500)
    np.testing.assert_array_equal(masks[0], label > 0)


def test_prepare_crop_multi_instance(crop, tmp_path, rng):
    src, xyz, rgb, _ = crop
    label = np.zeros(500, np.int32)
    label[:100] = 1
    label[100:250] = 2
    p = tmp_path / "multi_0.ply"
    write_crop_ply(p, xyz, rgb, label)
    out_ply = prepare_crop(p, tmp_path / "out2")
    masks = np.load(out_ply.with_suffix(".masks.npy"))
    assert masks.shape == (2, 500)
    assert masks[0].sum() == 100 and masks[1].sum() == 150


def test_prepare_crop_no_label_errors(tmp_path, rng):
    from point_sam_tpu.utils.ply import save_ply

    xyz = rng.standard_normal((50, 3)).astype(np.float32)
    p = tmp_path / "nolabel.ply"
    save_ply(p, xyz)
    with pytest.raises(ValueError, match="label"):
        prepare_crop(p, tmp_path / "out3")
