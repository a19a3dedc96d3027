"""Native C++ preprocessing library: PIL parity and loader integration."""

import numpy as np
import pytest
from PIL import Image

from lanedetection_end2end_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable (no g++)")


def test_resample_matches_pil_bilinear():
    rng = np.random.default_rng(0)
    src = rng.integers(0, 256, (640, 1280, 3)).astype(np.uint8)
    ref = np.asarray(Image.fromarray(src).resize((512, 256), Image.BILINEAR),
                     dtype=np.float32) / 255.0
    got = native.resample_to_f32(src, 256, 512)
    # PIL uses fixed-point int16 weights; agree within 1/255
    assert np.abs(got - ref).max() <= 1.01 / 255


def test_resample_upscale_and_flip():
    rng = np.random.default_rng(1)
    src = rng.integers(0, 256, (64, 96, 3)).astype(np.uint8)
    ref = np.asarray(Image.fromarray(src).resize((192, 128), Image.BILINEAR),
                     dtype=np.float32) / 255.0
    got = native.resample_to_f32(src, 128, 192)
    assert np.abs(got - ref).max() <= 1.01 / 255
    flipped = native.resample_to_f32(src, 128, 192, flip=True)
    np.testing.assert_array_equal(flipped, got[:, ::-1])


def test_nearest_matches_pil():
    rng = np.random.default_rng(2)
    mask = rng.integers(0, 5, (640, 1280)).astype(np.uint8)
    ref = np.asarray(Image.fromarray(mask).resize((512, 256), Image.NEAREST))
    got = native.resize_nearest_u8(mask, 256, 512)
    np.testing.assert_array_equal(got, ref)


def test_dataset_uses_native_consistently(tmp_path):
    """The dataset path must produce the same labels/shapes with the native
    decoder as the data tests already validated (smoke of integration)."""
    from lanedetection_end2end_tpu.data import make_synthetic_root, LaneDataset
    root = make_synthetic_root(str(tmp_path), num_train=2, num_test=0, seed=1)
    ds = LaneDataset("bp", root["image_dir"], root["gt_dir"], valid_idx=[],
                     resize=64, nclasses=4, lanes_file=root["lanes_file"],
                     line_file=root["line_file"])
    s = ds[0]
    assert s["image"].shape == (64, 128, 3)
    assert s["image"].dtype == np.float32
    assert set(np.unique(s["gt"])) <= {0, 1, 2, 3, 4}
