"""Data-pipeline tests: filtering/split parity, transforms, label helpers."""

import numpy as np
import pytest

from srgan_tpu.data import (
    DataLoader,
    FaceDataset,
    build_label_folder,
    class_encode,
    get_class_label,
    get_target,
    make_synthetic_celeba,
)


@pytest.fixture(scope="module")
def celeba(tmp_path_factory):
    out = tmp_path_factory.mktemp("celeba")
    img_root, attr_file = make_synthetic_celeba(str(out), n_per_class=10)
    return img_root, attr_file


def test_get_class_label_order():
    """Class order [(1,1),(1,-1),(-1,1),(-1,-1)] (dataset.py:11-18)."""
    assert get_class_label(2) == [(1, 1), (1, -1), (-1, 1), (-1, -1)]


def test_class_encode_onehot():
    ref = np.eye(4)
    out = class_encode([2, 0], ref)
    np.testing.assert_array_equal(out, [[0, 0, 1, 0], [1, 0, 0, 0]])


def test_get_target_excludes_source():
    labels = np.array([0, 1, 2, 3, 0])
    tgt = get_target(labels, (0, 1, 2, 3), shuffle=True,
                     rng=np.random.default_rng(0))
    assert tgt.shape == (5, 3)
    for row, src in zip(tgt, labels):
        assert src not in row
        assert sorted(row) == sorted(set(range(4)) - {src})


def test_get_target_whole():
    tgt = get_target(np.array([1, 2]), (0, 1, 2, 3), whole=True,
                     shuffle=False)
    np.testing.assert_array_equal(tgt, [[0, 1, 2, 3], [0, 1, 2, 3]])


def test_dataset_filtering_and_split(celeba):
    img_root, attr_file = celeba
    ds = FaceDataset(img_root, attr_file=attr_file, data_type="train",
                     train_num=6, val_num=2, test_num=2)
    # 4 classes x train 6
    assert len(ds) == 24
    labels = np.asarray(ds.labels)
    assert [np.sum(labels == i) for i in range(4)] == [6, 6, 6, 6]
    # class-major ordering with sorted paths (quirk ledger #10)
    assert labels.tolist() == sorted(labels.tolist())
    assert ds.images[:6] == sorted(ds.images[:6])

    val = FaceDataset(img_root, attr_file=attr_file, data_type="val",
                      train_num=6, val_num=2, test_num=2)
    test = FaceDataset(img_root, attr_file=attr_file, data_type="test",
                       train_num=6, val_num=2, test_num=2)
    assert len(val) == 8 and len(test) == 8
    # splits are disjoint
    assert not (set(ds.images) & set(val.images))
    assert not (set(ds.images) & set(test.images))


def test_dataset_train_num_capping(celeba):
    """new_train_num = min(train_num, N - val - test) (dataset.py:111)."""
    img_root, attr_file = celeba
    ds = FaceDataset(img_root, attr_file=attr_file, data_type="train",
                     train_num=10_000, val_num=2, test_num=3)
    assert len(ds) == 4 * (10 - 2 - 3)


def test_label_folder_roundtrip(celeba, tmp_path):
    """The chunked-pickle path matches the direct attr-file path."""
    img_root, attr_file = celeba
    build_label_folder(attr_file, str(tmp_path / "lf"))
    ds_a = FaceDataset(img_root, attr_file=attr_file, data_type="train",
                       train_num=6, val_num=2, test_num=2)
    ds_b = FaceDataset(img_root, label_root=str(tmp_path / "lf"),
                       data_type="train", train_num=6, val_num=2, test_num=2)
    assert ds_a.images == ds_b.images
    assert ds_a.labels == ds_b.labels


def test_transform_shape_and_range(celeba):
    img_root, attr_file = celeba
    ds = FaceDataset(img_root, attr_file=attr_file, data_type="test",
                     train_num=6, val_num=2, test_num=2)
    img, label = ds[0]
    assert img.shape == (128, 128, 3)
    assert img.dtype == np.float32
    # per-image min-max to [-1, 1]: extremes are exactly hit
    assert img.min() == pytest.approx(-1.0, abs=1e-5)
    assert img.max() == pytest.approx(1.0, abs=1e-4)
    assert label in range(4)


def test_transform_matches_torch_interpolate_oracle(celeba):
    """Crop+resize parity with an independent oracle: torchvision's
    CenterCrop box formula (top/left = round((size - crop)/2), its
    functional.py) + torch F.interpolate(bilinear, antialias=True), which
    reproduces PIL's triangle-filter BILINEAR to ~1e-2.  (torchvision itself
    is not installed in this env; torch is.)"""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    img_root, attr_file = celeba
    ds = FaceDataset(img_root, attr_file=attr_file, data_type="test",
                     train_num=6, val_num=2, test_num=2, flip=False)
    raw = ds.load_raw(0)
    ours = ds.transform(raw, flip=False)

    arr = np.asarray(raw, np.float32) / 255.0      # (H, W, 3) in [0, 1]
    h, w = arr.shape[:2]
    c = 178
    top = int(round((h - c) / 2.0))
    left = int(round((w - c) / 2.0))
    cropped = arr[top:top + c, left:left + c]
    t = torch.from_numpy(cropped.transpose(2, 0, 1))[None]
    resized = F.interpolate(t, size=(128, 128), mode="bilinear",
                            antialias=True)[0].numpy().transpose(1, 2, 0)
    ref = (resized - resized.min()) / (resized.max() - resized.min() + 1e-8) \
        * 2 - 1
    np.testing.assert_allclose(ours, ref, atol=2e-2)


def test_loader_batches(celeba):
    img_root, attr_file = celeba
    ds = FaceDataset(img_root, attr_file=attr_file, data_type="train",
                     train_num=6, val_num=2, test_num=2)
    dl = DataLoader(ds, batch_size=8, drop_last=True, seed=0)
    batches = list(dl)
    assert len(batches) == len(dl) == 3
    b = batches[0]
    assert b["image"].shape == (8, 128, 128, 3)
    assert b["source_label"].shape == (8,)
    assert b["target_label"].shape == (8,)
    assert (b["target_label"] != b["source_label"]).all()
    # shuffling changes order between epochs
    e2 = next(iter(dl))
    assert not np.array_equal(b["image"], e2["image"])


def test_structured_fixture_mode(tmp_path):
    """Round-4 structured fixture: smooth low-frequency content whose class
    signal is the mean color (docs/TRAINING_EVIDENCE.md "PRDC": the noise
    fixture makes PRDC degenerate; the structured one makes it informative).
    """
    img_root, attr_file = make_synthetic_celeba(
        str(tmp_path), n_per_class=4, mode="structured", seed=3)
    ds = FaceDataset(img_root, attr_file=attr_file, data_type="train",
                     train_num=4, val_num=0, test_num=0)
    assert len(ds) == 16
    by = {c: np.stack([ds[i][0] for i in range(len(ds))
                       if ds.labels[i] == c]) for c in range(4)}
    # class color signatures: R high for male classes (0, 1), G high for
    # smiling classes (0, 2) — same ordering as the noise fixture
    r = {c: by[c][..., 0].mean() for c in range(4)}
    g = {c: by[c][..., 1].mean() for c in range(4)}
    assert min(r[0], r[1]) > max(r[2], r[3])
    assert min(g[0], g[2]) > max(g[1], g[3])
    # smoothness: neighboring-pixel correlation far above the noise mode's
    def neighbor_corr(x):
        a = x[:, :-1, :, :].ravel()
        b = x[:, 1:, :, :].ravel()
        return np.corrcoef(a, b)[0, 1]
    noise_root, noise_attr = make_synthetic_celeba(
        str(tmp_path / "noise"), n_per_class=4, mode="noise", seed=3)
    nds = FaceDataset(noise_root, attr_file=noise_attr, data_type="train",
                      train_num=4, val_num=0, test_num=0)
    noise = np.stack([nds[i][0] for i in range(4)])
    assert neighbor_corr(by[0]) > 0.95
    assert neighbor_corr(noise) < 0.9
