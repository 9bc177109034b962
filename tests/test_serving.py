"""Serving surface: Translator + the HTTP server end-to-end on CPU."""

import threading
import urllib.request

import jax
import numpy as np

from srgan_tpu.configs import ExperimentConfig, LossWeights, ModelConfig, TrainConfig
from srgan_tpu.serving import (Translator, decode_npz, encode_npz,
                               make_handler)
from srgan_tpu.training import GANTrainer
from srgan_tpu.utils.checkpoint import save_checkpoint

HW = 32


def tiny_cfg() -> ExperimentConfig:
    model = ModelConfig(image_size=HW, g_nch=8, g_res_num=1, d_nch=8,
                        d_num_cls=2, e_nch=8, e_num_cls=2)
    train = TrainConfig(batch_size=8, unrolled_k=1, encoded_feature="mu")
    return ExperimentConfig(name="serve_tiny", model=model, train=train,
                            loss=LossWeights.proposed_kl(cls=1.0),
                            trainer="srgan")


def _make_ckpt(tmp_path):
    cfg = tiny_cfg()
    t = GANTrainer(cfg, donate=False)
    state = t.init_state(jax.random.PRNGKey(0), image_size=HW)
    save_checkpoint(str(tmp_path / "ckpt"), state, step=0)
    return cfg


def test_translator_pads_chunks_and_is_deterministic(tmp_path):
    cfg = _make_ckpt(tmp_path)
    tr = Translator(cfg, str(tmp_path / "ckpt"), step=0,
                    warm_batch_sizes=(2, 4))
    rng = np.random.default_rng(0)
    # 7 images: chunked 4 + 3(padded to 4); latent fixed => deterministic
    imgs = rng.uniform(-1, 1, (7, HW, HW, 3)).astype(np.float32)
    tgt = rng.integers(0, 4, 7)
    lat = rng.standard_normal((7, cfg.model.ndim)).astype(np.float32)
    out1, used1 = tr.translate(imgs, tgt, latent=lat)
    out2, _ = tr.translate(imgs, tgt, latent=lat)
    assert out1.shape == (7, HW, HW, 3)
    np.testing.assert_array_equal(out1, out2)
    np.testing.assert_array_equal(used1, lat)
    assert np.abs(out1).max() <= 1.0 + 1e-5   # tanh range
    # batch-size invariance: single-image call matches the batched result
    solo, _ = tr.translate(imgs[:1], tgt[:1], latent=lat[:1])
    np.testing.assert_allclose(solo[0], out1[0], atol=1e-5)

    enc = tr.encode(imgs)
    assert enc["mu"].shape == (7, cfg.model.ndim)


def test_http_server_translate_and_encode(tmp_path):
    from http.server import ThreadingHTTPServer

    cfg = _make_ckpt(tmp_path)
    tr = Translator(cfg, str(tmp_path / "ckpt"), step=0,
                    warm_batch_sizes=(4,))
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(tr))
    port = server.server_address[1]
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz") as r:
            assert r.read() == b"ok"

        rng = np.random.default_rng(1)
        imgs = rng.uniform(-1, 1, (3, HW, HW, 3)).astype(np.float32)
        body = encode_npz(images=imgs,
                          target_labels=np.full(3, 2, np.int64))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/translate", body)
        out = decode_npz(urllib.request.urlopen(req).read())
        assert out["fakes"].shape == (3, HW, HW, 3)
        assert out["latent"].shape == (3, cfg.model.ndim)

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/encode", encode_npz(images=imgs))
        out = decode_npz(urllib.request.urlopen(req).read())
        assert out["mu"].shape == (3, cfg.model.ndim)

        # malformed request -> 400, server stays alive
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/translate", b"garbage")
        try:
            urllib.request.urlopen(bad)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz") as r:
            assert r.read() == b"ok"
    finally:
        server.shutdown()
