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


def test_translator_unversioned_checkpoint_refused(tmp_path):
    """Serving from a pre-versioning checkpoint (possibly the rounds-1-2
    unflipped ConvTranspose layout) must fail actionably, not silently
    compute rotated up-conv kernels (VERDICT r3 item 3)."""
    import os

    import pytest

    cfg = _make_ckpt(tmp_path)
    os.remove(str(tmp_path / "ckpt" / "format.json"))
    with pytest.raises(ValueError, match="format.json"):
        Translator(cfg, str(tmp_path / "ckpt"), step=0, warmup=False)
    # explicit layout assertion unblocks it
    tr = Translator(cfg, str(tmp_path / "ckpt"), step=0, warmup=False,
                    unversioned="preflipped")
    assert tr.state is not None


def test_translator_mismatched_config_clear_error(tmp_path):
    """A checkpoint saved under a different architecture must raise a clear
    config-mismatch message, not an opaque pytree exception."""
    import dataclasses

    import pytest

    cfg = _make_ckpt(tmp_path)
    other = dataclasses.replace(
        cfg, name="serve_other",
        model=dataclasses.replace(cfg.model, g_nch=16))
    with pytest.raises(ValueError, match="does not match the serving config"):
        Translator(other, str(tmp_path / "ckpt"), step=0, warmup=False)


def test_http_server_concurrent_requests(tmp_path):
    """Two parallel /translate posts through ThreadingHTTPServer: jit
    dispatch must be thread-safe and both responses correct (VERDICT r3
    serving robustness)."""
    from http.server import ThreadingHTTPServer

    cfg = _make_ckpt(tmp_path)
    tr = Translator(cfg, str(tmp_path / "ckpt"), step=0,
                    warm_batch_sizes=(4,))
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(tr))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    rng = np.random.default_rng(2)
    imgs = rng.uniform(-1, 1, (4, HW, HW, 3)).astype(np.float32)
    lat = rng.standard_normal((4, cfg.model.ndim)).astype(np.float32)
    results, errors = {}, []

    def post(i, target_cls):
        try:
            body = encode_npz(images=imgs, latent=lat,
                              target_labels=np.full(4, target_cls, np.int64))
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/translate", body)
            results[i] = decode_npz(urllib.request.urlopen(req).read())
        except Exception as e:   # surface in the main thread
            errors.append(e)

    try:
        threads = [threading.Thread(target=post, args=(i, i % 4))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors, errors
        assert len(results) == 4
        # same latent+target => identical output regardless of concurrency
        ref0, _ = tr.translate(imgs, np.full(4, 0, np.int64), latent=lat)
        np.testing.assert_allclose(results[0]["fakes"], ref0, atol=1e-5)
        # different targets produce different translations
        assert not np.allclose(results[0]["fakes"], results[1]["fakes"])
    finally:
        server.shutdown()
