"""Data subsystem tests: splits, datasets (both profiles), flip mirroring,
loaders, device prefetch, and geometric consistency of the synthetic data."""

import numpy as np
import pytest

import jax

from lanedetection_end2end_tpu.data import (
    LaneDataset, LaneTestSet, Loader, DevicePrefetcher, get_loader,
    get_testloader, split_indices, make_synthetic_root, mirror_list,
    read_json_lines)


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    path = tmp_path_factory.mktemp("synth")
    return make_synthetic_root(str(path), num_train=12, num_test=5, seed=0)


def _bp_dataset(root, valid_idx=(), flip_on=False, nclasses=4):
    return LaneDataset("bp", root["image_dir"], root["gt_dir"],
                       valid_idx=list(valid_idx), resize=256,
                       nclasses=nclasses, flip_on=flip_on,
                       lanes_file=root["lanes_file"],
                       line_file=root["line_file"])


def _bev_dataset(root, valid_idx=(), flip_on=False):
    return LaneDataset("bev", root["image_dir"], root["gt_dir"],
                       valid_idx=list(valid_idx), resize=256, nclasses=2,
                       flip_on=flip_on, curves_file=root["curves_file"],
                       line_file=root["line_file"])


# ----------------------------------------------------------------------
def test_split_matches_reference_semantics():
    # np.random.seed(num_train); np.random.shuffle(indices)
    # (Load_Data_new.py:301-303)
    num_train = 100
    np.random.seed(num_train)
    ref = np.arange(num_train)
    np.random.shuffle(ref)
    split = int(np.floor(0.2 * num_train))
    train_idx, valid_idx = split_indices(num_train, 0.2, shuffle=True)
    assert valid_idx == list(ref[:split])
    assert train_idx == list(ref[split:])


def test_mirror_list_involution():
    lst = list(range(10))
    assert mirror_list(mirror_list(lst)) == lst
    # slots 3:7 = [ll, l, r, rr] -> mirrored [rr, r, l, ll] pairwise swap
    m = mirror_list(lst)
    assert m[3:7] == [lst[6], lst[5], lst[4], lst[3]]


# ----------------------------------------------------------------------
def test_bp_sample_shapes(root):
    ds = _bp_dataset(root)
    s = ds[0]
    assert s["image"].shape == (256, 512, 3)
    assert s["image"].dtype == np.float32
    assert 0.0 <= s["image"].min() and s["image"].max() <= 1.0
    assert s["gt"].shape == (256, 512)
    assert s["lanes"].shape == (4, 56)
    assert s["valid_points"].shape == (4, 56)
    assert s["line"].shape == (4,)
    assert s["horizon"].shape == (256,)
    assert set(np.unique(s["gt"])) <= {0, 1, 2, 3, 4}
    # valid points start at h_samples >= 210 (Load_Data_new.py:140-141)
    assert not s["valid_points"][:, :8].any()


def test_bev_sample_shapes(root):
    ds = _bev_dataset(root)
    s = ds[0]
    assert s["params"].shape == (4, 3)
    assert s["line"].shape == (4,)
    assert set(np.unique(s["gt"])) <= {0, 1, 2}  # classes 3/4 zeroed
    assert set(np.unique(s["line"])) <= {0, 1, 2}


def test_bp_flip_mirrors_labels(root):
    ds = _bp_dataset(root, flip_on=True)
    plain = ds.__getitem__(0, flip=False)
    flipped = ds.__getitem__(0, flip=True)
    np.testing.assert_allclose(flipped["image"], plain["image"][:, ::-1])
    # lanes mirror: x -> (2*resize-1) - x with pair swap [1,0,3,2]
    track = plain["lanes"] == -2
    expect = (2 * 256 - 1) - plain["lanes"]
    expect[track] = -2
    expect = expect[[1, 0, 3, 2]]
    np.testing.assert_allclose(flipped["lanes"], expect, atol=1e-3)
    np.testing.assert_allclose(flipped["valid_points"],
                               plain["valid_points"][[1, 0, 3, 2]])
    # gt classes swap 1<->2, 3<->4 on the mirrored mask
    g = plain["gt"][:, ::-1]
    remap = np.array([0, 2, 1, 4, 3])
    np.testing.assert_array_equal(flipped["gt"], remap[g])


def test_bev_flip_mirrors_params(root):
    ds = _bev_dataset(root, flip_on=True)
    plain = ds.__getitem__(0, flip=False)
    flipped = ds.__getitem__(0, flip=True)
    p = plain["params"][[1, 0, 3, 2]]
    expect = -p
    expect[:, -1] = 1 + expect[:, -1]
    np.testing.assert_allclose(flipped["params"], expect, rtol=1e-6)


def test_flip_never_applied_to_validation_images(root):
    ds = _bp_dataset(root, valid_idx=[0], flip_on=True)
    plain = ds.__getitem__(0, flip=False)
    flipped = ds.__getitem__(0, flip=True)
    np.testing.assert_array_equal(plain["image"], flipped["image"])


# ----------------------------------------------------------------------
def test_synthetic_geometric_consistency(root):
    """Resized gt-mask lane pixels must sit on the labeled lane coordinates."""
    ds = _bp_dataset(root)
    s = ds[0]
    lanes, valid = s["lanes"], s["valid_points"]
    gt = s["gt"]
    h_res = np.arange(160, 720, 10) / 2.5 - 32.0
    errs = []
    for k in range(4):
        for j in range(56):
            if not valid[k, j]:
                continue
            row = int(round(h_res[j]))
            cols = np.flatnonzero(gt[row] == k + 1)
            if cols.size == 0:
                continue
            errs.append(abs(cols.mean() - lanes[k, j]))
    assert errs, "no overlapping gt/label points found"
    assert np.median(errs) < 4.0  # sub-marking-width agreement


def test_bev_params_describe_mask(root):
    """BEV poly_params evaluated at a bottom row must land inside the lane
    marking of the resized mask (checks label/homography consistency)."""
    from lanedetection_end2end_tpu.geometry import (
        bev_matrices_normalized, homogeneous_transform)
    ds = _bev_dataset(root)
    s = ds[0]
    a, b, c = s["params"][0]  # ego-left
    M, M_inv = bev_matrices_normalized()
    y_prime = 0.8  # well below the horizon, in BEV-normalized y
    y_eval = 1.0 - y_prime
    x_bev = a * y_eval ** 2 + b * y_eval + c
    x_im, y_im = homogeneous_transform(M_inv, np.array([x_bev]),
                                       np.array([y_prime]))
    col, row = int(x_im[0] * 511), int(y_im[0] * 255)
    band = s["gt"][row, max(0, col - 12): col + 13]
    assert (band == 1).any()


# ----------------------------------------------------------------------
def test_loader_shapes_and_determinism(root):
    ds = _bp_dataset(root)
    loader = Loader(ds, range(len(ds)), batch_size=4, shuffle=True, seed=7)
    b1 = [b["idx"].tolist() for b in loader]
    b2 = [b["idx"].tolist() for b in loader]
    assert b1 == b2  # same epoch -> same order
    loader.set_epoch(1)
    b3 = [b["idx"].tolist() for b in loader]
    assert b1 != b3  # different epoch -> reshuffled
    batch = next(iter(loader))
    assert batch["image"].shape == (4, 256, 512, 3)
    assert batch["lanes"].shape == (4, 4, 56)


def test_get_loader_factory(root):
    def factory(valid_idx):
        return _bp_dataset(root, valid_idx=valid_idx)
    train_loader, valid_loader, valid_idx = get_loader(
        factory, num_train=12, batch_size=4, nworkers=2)
    assert len(valid_idx) == 2  # floor(0.2*12)
    assert len(train_loader) == 2  # 10 train -> 2 full batches of 4
    assert len(valid_loader) == 0  # 2 < 4: dropped (drop_last semantics)


def test_testloader_pads_final_batch(root):
    ts = LaneTestSet(root["test_label_file"], root["test_dir"], resize=256)
    assert len(ts) == 5
    loader = get_testloader(ts, batch_size=4, nworkers=2)
    batches = list(loader)
    assert len(batches) == 2  # 5 -> padded to 8
    assert loader.num_real == 5
    # padded tail repeats the last image
    np.testing.assert_array_equal(batches[1]["image"][1],
                                  batches[1]["image"][2])


def test_device_prefetcher_shards_batch(root):
    ds = _bp_dataset(root)
    loader = Loader(ds, range(8), batch_size=8, shuffle=False)
    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data"))
    batches = list(DevicePrefetcher(loader, sharding))
    assert len(batches) == 1
    img = batches[0]["image"]
    assert isinstance(img, jax.Array)
    assert img.shape == (8, 256, 512, 3)
    assert len(img.sharding.device_set) == 8


def test_labels_roundtrip(root):
    recs = read_json_lines(root["lanes_file"])
    assert len(recs) == 12
    assert len(recs[0]["lanes"]) == 4
    assert len(recs[0]["h_samples"]) == 56


def test_loader_multihost_sharding(root):
    """Per-process input sharding: simulated processes agree on the epoch
    permutation and together cover each global batch exactly, in the row
    order NamedSharding(P('data')) expects."""
    ds = _bp_dataset(root)
    global_loader = Loader(ds, range(12), batch_size=4, shuffle=True, seed=3,
                           process_index=0, process_count=1)
    shard_loaders = [Loader(ds, range(12), batch_size=4, shuffle=True, seed=3,
                            process_index=p, process_count=2)
                     for p in range(2)]
    assert all(ld.local_batch_size == 2 for ld in shard_loaders)
    assert len(global_loader) == len(shard_loaders[0]) == 3
    global_batches = list(global_loader)
    parts = [list(ld) for ld in shard_loaders]
    for b in range(3):
        reassembled = np.concatenate(
            [parts[0][b]["idx"], parts[1][b]["idx"]])
        np.testing.assert_array_equal(reassembled, global_batches[b]["idx"])
        np.testing.assert_array_equal(
            np.concatenate([parts[0][b]["image"], parts[1][b]["image"]]),
            global_batches[b]["image"])

    with pytest.raises(ValueError):
        Loader(ds, range(12), batch_size=4, process_index=0, process_count=3)


def test_make_array_from_process_local_data_path(root):
    """The DevicePrefetcher multi-controller assembly primitive produces the
    same sharded global array as device_put in the 1-process case."""
    ds = _bp_dataset(root)
    batch = next(iter(Loader(ds, range(8), batch_size=8, shuffle=False)))
    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data"))
    a = jax.device_put(batch["image"], sharding)
    b = jax.make_array_from_process_local_data(
        sharding, batch["image"], batch["image"].shape)
    assert b.sharding.is_equivalent_to(a.sharding, a.ndim)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_uint8_mode_defers_flip_to_device(root):
    """Compact-transfer (image_dtype='uint8') parity with float32 mode:
    the dataset ships the image UNFLIPPED uint8 + a `flip` flag and the
    gt remains uint8; prepare_batch (the device side) mirrors + widens so
    the resulting tensors match the float32-mode host pipeline exactly."""
    from lanedetection_end2end_tpu.data.loader import collate
    from lanedetection_end2end_tpu.train.steps import prepare_batch

    ds8 = LaneDataset("bp", root["image_dir"], root["gt_dir"], valid_idx=[],
                      resize=256, nclasses=4, flip_on=True,
                      lanes_file=root["lanes_file"],
                      line_file=root["line_file"], image_dtype="uint8")
    ds32 = _bp_dataset(root, flip_on=True, nclasses=4)

    flips = [False, True, True, False]
    b8 = collate([ds8.__getitem__(i, flip=f) for i, f in enumerate(flips)])
    b32 = collate([ds32.__getitem__(i, flip=f) for i, f in enumerate(flips)])

    assert b8["image"].dtype == np.uint8
    assert b8["gt"].dtype == np.uint8
    assert b8["flip"].tolist() == flips
    # unflipped on host even for flip=True samples
    np.testing.assert_array_equal(b8["image"][1],
                                  ds8.__getitem__(1, flip=False)["image"])

    prepped = prepare_batch(jax.device_put(b8))
    assert "flip" not in prepped
    assert prepped["gt"].dtype == np.int32
    np.testing.assert_array_equal(np.asarray(prepped["gt"]), b32["gt"])
    # u8/255 on device vs native u8_to_unit_f32 on host: bit-identical
    np.testing.assert_array_equal(np.asarray(prepped["image"]), b32["image"])
    for k in ("lanes", "valid_points", "line", "horizon"):
        np.testing.assert_array_equal(b8[k], b32[k])
    # float32-mode batches pass through untouched
    same = prepare_batch(jax.device_put(b32))
    assert same["image"].dtype == np.float32


def test_bev_uint8_gt_lut_drops_and_swaps(root):
    """BEV LUT folds the always-on 3/4 drop and the mirror 1<->2 swap."""
    ds = LaneDataset("bev", root["image_dir"], root["gt_dir"], valid_idx=[],
                     resize=256, nclasses=2, flip_on=True,
                     curves_file=root["curves_file"],
                     line_file=root["line_file"], image_dtype="uint8")
    raw = np.array([[0, 1, 2, 3, 4]], dtype=np.uint8)
    np.testing.assert_array_equal(ds._remap_gt(raw, False),
                                  [[0, 1, 2, 0, 0]])
    np.testing.assert_array_equal(ds._remap_gt(raw, True),
                                  [[0, 0, 1, 2, 0]])  # reversed then swapped
