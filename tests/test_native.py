"""Native C++ data-loader tests: build, decode parity, batch path."""

import numpy as np
import pytest

from srgan_tpu import native
from srgan_tpu.data import DataLoader, FaceDataset, make_synthetic_celeba


@pytest.fixture(scope="module")
def celeba(tmp_path_factory):
    out = tmp_path_factory.mktemp("celeba_native")
    return make_synthetic_celeba(str(out), n_per_class=8)


needs_native = pytest.mark.skipif(not native.available(),
                                  reason=f"native build failed: "
                                         f"{native.build_error()}")


@needs_native
def test_native_matches_pil_transform(celeba):
    img_root, attr_file = celeba
    ds = FaceDataset(img_root, attr_file=attr_file, data_type="train",
                     train_num=8, val_num=0, test_num=0, flip=False)
    for i in (0, 3, 11):
        pil = ds.transform(ds.load_raw(i), flip=False)
        nat = native.load_image(ds.images[i], ds.crop, ds.image_size, False)
        # PIL uses 8-bit fixed-point filter coefficients; float path differs
        # by <2% of the [-1,1] range
        assert np.abs(nat - pil).max() < 0.04
        assert nat.min() == pytest.approx(-1.0, abs=1e-5)
        assert nat.max() == pytest.approx(1.0, abs=1e-4)


@needs_native
def test_native_flip(celeba):
    img_root, attr_file = celeba
    ds = FaceDataset(img_root, attr_file=attr_file, data_type="train",
                     train_num=8, val_num=0, test_num=0)
    a = native.load_image(ds.images[0], 178, 128, False)
    b = native.load_image(ds.images[0], 178, 128, True)
    np.testing.assert_allclose(b, a[:, ::-1], atol=1e-6)


@needs_native
def test_native_batch_matches_single(celeba):
    img_root, attr_file = celeba
    ds = FaceDataset(img_root, attr_file=attr_file, data_type="train",
                     train_num=8, val_num=0, test_num=0)
    batch = native.load_batch(ds.images[:6], 178, 128,
                              np.zeros(6, np.uint8), num_threads=4)
    for i in range(6):
        single = native.load_image(ds.images[i], 178, 128, False)
        np.testing.assert_allclose(batch[i], single, atol=1e-6)


@needs_native
def test_native_missing_file_errors():
    with pytest.raises(IOError):
        native.load_image("/nonexistent/nope.png", 178, 128, False)


@needs_native
def test_loader_uses_native_path(celeba):
    img_root, attr_file = celeba
    ds = FaceDataset(img_root, attr_file=attr_file, data_type="train",
                     train_num=8, val_num=0, test_num=0)
    dl = DataLoader(ds, batch_size=8, seed=0)
    assert dl.use_native
    b = next(iter(dl))
    assert b["image"].shape == (8, 128, 128, 3)
    assert b["image"].dtype == np.float32
    # same seed, native off: identical labels (images differ only by filter
    # precision and flip draws consumed from the same rng stream)
    dl2 = DataLoader(ds, batch_size=8, seed=0, use_native=False)
    b2 = next(iter(dl2))
    np.testing.assert_array_equal(b["source_label"], b2["source_label"])
