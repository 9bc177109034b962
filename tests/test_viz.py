"""Visualization/reporting tests with a tiny trainer on CPU."""

import os

import jax
import numpy as np
import pytest

from srgan_tpu.configs import ExperimentConfig, LossWeights, ModelConfig, TrainConfig
from srgan_tpu.data import FaceDataset, make_synthetic_celeba
from srgan_tpu.data.dataset import LABEL_DESCRIPTION
from srgan_tpu.training import GANTrainer
from srgan_tpu.utils.viz import (
    get_samples,
    plot_confusion_matrix,
    plot_correlation_matrix,
    save_gif,
    training_progress_grid,
)

HW = 32


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    out = tmp_path_factory.mktemp("viz")
    img_root, attr_file = make_synthetic_celeba(str(out), n_per_class=6)
    ds = FaceDataset(img_root, attr_file=attr_file, data_type="test",
                     train_num=4, val_num=0, test_num=2, image_size=HW)
    model = ModelConfig(image_size=HW, g_nch=8, g_res_num=1, d_nch=8,
                        d_num_cls=2, e_nch=8, e_num_cls=2)
    cfg = ExperimentConfig(name="viz", model=model,
                           train=TrainConfig(batch_size=4, unrolled_k=1),
                           loss=LossWeights.proposed_kl(cls=1.0),
                           trainer="srgan")
    trainer = GANTrainer(cfg, donate=False)
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=HW)
    return trainer, state, ds


def test_training_progress_grid(setup, tmp_path):
    trainer, state, ds = setup
    fig = training_progress_grid(trainer, state, ds, 0, LABEL_DESCRIPTION,
                                 random_sample_num=2)
    # 4 columns x (1 + 2 samples) rows of panels
    assert len(fig.axes) == 4 + 3 + 3 * 2
    fig.savefig(tmp_path / "grid.png")
    assert (tmp_path / "grid.png").stat().st_size > 0


def test_get_samples_sweep(setup):
    trainer, state, ds = setup
    latent = np.random.default_rng(0).standard_normal((5, 8)).astype(np.float32)
    data, label = get_samples(trainer, state, ds, 0, latent, batch=2)
    assert set(data["target"]) == {0, 1, 2, 3}
    for cls in range(4):
        assert data["target"][cls].shape == (5, HW, HW, 3)
        assert label["latent"][cls].shape == (5, 8)
    # per-class latent lists are also accepted
    data2, _ = get_samples(trainer, state, ds, 0,
                           [latent[:2]] * 4, batch=2)
    assert data2["target"][0].shape == (2, HW, HW, 3)


def test_save_gif(setup, tmp_path):
    imgs = np.random.default_rng(0).uniform(-1, 1, (4, HW, HW, 3))
    path = tmp_path / "sweep.gif"
    save_gif(imgs.astype(np.float32), str(path))
    assert path.stat().st_size > 0
    from PIL import Image
    with Image.open(path) as g:
        assert g.n_frames == 4


def test_matrix_plots(tmp_path):
    cm = np.array([[8, 1], [2, 9]])
    fig = plot_confusion_matrix(cm, ["a", "b"],
                                save_path=str(tmp_path / "cm.png"))
    assert (tmp_path / "cm.png").stat().st_size > 0
    corr = np.corrcoef(np.random.default_rng(0).standard_normal((4, 50)))
    fig = plot_correlation_matrix(corr, save_path=str(tmp_path / "corr.png"))
    assert (tmp_path / "corr.png").stat().st_size > 0


def test_plot_loss_curves(tmp_path):
    """nb01 cell-22 loss panel equivalent over a metrics.jsonl log, both
    from a file path and from loaded dicts; component panel optional."""
    import json

    from srgan_tpu.utils.viz import plot_loss_curves

    rows = [{"step": s, "errD": 1.0 / (s + 1), "errG": 2.0 / (s + 1),
             "errE": 100.0 / (s + 1), "loss_cycle": 0.5 / (s + 1),
             "loss_hist": 40.0 / (s + 1)} for s in range(10)]
    log = tmp_path / "metrics.jsonl"
    log.write_text("".join(json.dumps(r) + "\n" for r in rows))

    fig = plot_loss_curves(str(log), save_path=str(tmp_path / "losses.png"))
    assert (tmp_path / "losses.png").stat().st_size > 0
    assert len(fig.axes) == 2  # model panel + component panel

    # no loss_* components (classifier job shape) -> single panel;
    # missing model keys are skipped rather than KeyError
    fig = plot_loss_curves([{"step": 0, "errD": 1.0}, {"step": 1,
                                                       "errD": 0.5}])
    assert len(fig.axes) == 1

    with pytest.raises(ValueError):
        plot_loss_curves([])

    # zero/negative values (possible for future signed channels) must not
    # silently vanish from a log axis -> symlog fallback per panel
    fig = plot_loss_curves([{"step": 0, "errD": 0.0, "loss_x": 1.0},
                            {"step": 1, "errD": -0.5, "loss_x": 0.5}])
    assert fig.axes[0].get_yscale() == "symlog"
    assert fig.axes[1].get_yscale() == "log"
