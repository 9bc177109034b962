"""Batch-inference / serving surface.

The reference has no serving story (its inference is notebook cells calling
``get_samples``).  For production deployment this module provides:

  - ``Translator``: loads a trained checkpoint and exposes the inference
    surface (translate / encode / sample_latents) with per-shape jit
    compilation and optional ahead-of-time warmup so first-request latency
    is paid at startup, not serve time;
  - ``scripts/serve.py`` wraps it in a dependency-free HTTP server
    (stdlib ``http.server``) speaking npz request/response bodies.

TPU notes: inference runs at the trainer's compute dtype (bfloat16 on TPU),
batches are padded to the warmed batch sizes to avoid retracing, and inputs
are device_put once per request.
"""

from __future__ import annotations

import io
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from srgan_tpu.configs import ExperimentConfig
from srgan_tpu.training.gan import GANTrainer
from srgan_tpu.utils.checkpoint import (
    CheckpointVersionError,
    restore_checkpoint,
)


class Translator:
    """Checkpoint-backed style-translation service.

    ``warm_batch_sizes`` are compiled at construction; requests are padded
    up to the smallest warmed size that fits (and chunked above the
    largest), so serving never retraces.
    """

    def __init__(self, cfg: ExperimentConfig, ckpt_dir: str,
                 step: Optional[int] = None,
                 warm_batch_sizes: Sequence[int] = (1, 8, 32),
                 warmup: bool = True,
                 unversioned: str = "error"):
        self.cfg = cfg
        self.trainer = GANTrainer(cfg, donate=False)
        target = jax.device_get(self.trainer.init_state(
            jax.random.PRNGKey(0),
            freeze_pretrained=cfg.pretrained_encoder))
        try:
            self.state = restore_checkpoint(ckpt_dir, target, step=step,
                                            unversioned=unversioned)
        except CheckpointVersionError:
            raise   # version-guard errors are already actionable
        except Exception as e:
            # orbax structure mismatches are opaque; say what they mean here
            raise ValueError(
                f"checkpoint {ckpt_dir} does not match the serving config "
                f"'{cfg.name}' (trainer={cfg.trainer}, unrolled_k="
                f"{cfg.train.unrolled_k}, pretrained_encoder="
                f"{cfg.pretrained_encoder}).  Point --ckpt at the run dir "
                "whose config.json matches, or pass the run's own config "
                f"(original error: {type(e).__name__}: {e})") from e
        self.warm_sizes = tuple(sorted(warm_batch_sizes))
        self.ndim = cfg.model.ndim
        hw = cfg.model.image_size
        if warmup:
            for b in self.warm_sizes:
                dummy = np.zeros((b, hw, hw, 3), np.float32)
                self.translate(dummy, np.zeros(b, np.int64),
                               latent=np.zeros((b, self.ndim), np.float32))
                self.encode(dummy)

    # -- helpers ---------------------------------------------------------
    def _pad_to_warm(self, n: int) -> int:
        for b in self.warm_sizes:
            if n <= b:
                return b
        return self.warm_sizes[-1]

    def _chunks(self, n: int):
        biggest = self.warm_sizes[-1]
        i = 0
        while i < n:
            yield i, min(n - i, biggest)
            i += biggest

    # -- inference surface ----------------------------------------------
    def translate(self, images: np.ndarray, target_labels: np.ndarray,
                  latent: Optional[np.ndarray] = None,
                  seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
        """images: (N, H, W, 3) in [-1, 1]; returns (fakes, latents)."""
        images = np.asarray(images, np.float32)
        target_labels = np.asarray(target_labels)
        n = len(images)
        if latent is None:
            latent = np.asarray(
                jax.random.normal(jax.random.PRNGKey(seed),
                                  (n, self.ndim), jnp.float32))
        latent = np.asarray(latent, np.float32)
        outs = []
        for i, size in self._chunks(n):
            b = self._pad_to_warm(size)
            img = np.zeros((b,) + images.shape[1:], np.float32)
            img[:size] = images[i:i + size]
            lbl = np.zeros(b, target_labels.dtype)
            lbl[:size] = target_labels[i:i + size]
            lat = np.zeros((b, self.ndim), np.float32)
            lat[:size] = latent[i:i + size]
            fake, _ = self.trainer.transform(self.state, jnp.asarray(img),
                                             lbl, latent=jnp.asarray(lat))
            outs.append(np.asarray(fake[:size]))
        return np.concatenate(outs), latent

    def encode(self, images: np.ndarray,
               labels: Optional[np.ndarray] = None) -> Dict[str, np.ndarray]:
        images = np.asarray(images, np.float32)
        n = len(images)
        mus, logvars = [], []
        for i, size in self._chunks(n):
            b = self._pad_to_warm(size)
            img = np.zeros((b,) + images.shape[1:], np.float32)
            img[:size] = images[i:i + size]
            lbl = None
            if labels is not None:
                lbl = np.zeros(b, np.asarray(labels).dtype)
                lbl[:size] = np.asarray(labels)[i:i + size]
            out = self.trainer.encode(self.state, jnp.asarray(img), lbl)
            mus.append(np.asarray(out[0][:size]))
            logvars.append(np.asarray(out[1][:size]))
        return {"mu": np.concatenate(mus), "logvar": np.concatenate(logvars)}


# ---------------------------------------------------------------------------
# npz wire format (used by scripts/serve.py and its clients)
# ---------------------------------------------------------------------------

def make_handler(translator: "Translator"):
    """BaseHTTPRequestHandler subclass serving a Translator (used by
    scripts/serve.py; bodies are npz archives)."""
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, body: bytes,
                  ctype: str = "application/octet-stream"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, b"ok", "text/plain")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = decode_npz(self.rfile.read(n))
                if self.path == "/translate":
                    fakes, latent = translator.translate(
                        req["images"], req["target_labels"],
                        latent=req.get("latent"),
                        seed=int(req.get("seed", 0)))
                    self._send(200, encode_npz(fakes=fakes, latent=latent))
                elif self.path == "/encode":
                    out = translator.encode(req["images"],
                                            labels=req.get("labels"))
                    self._send(200, encode_npz(**out))
                else:
                    self._send(404, b"not found", "text/plain")
            except Exception as e:  # surface errors to the client
                self._send(400, str(e).encode(), "text/plain")

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return Handler


def encode_npz(**arrays) -> bytes:
    buf = io.BytesIO()
    np.savez_compressed(buf, **arrays)
    return buf.getvalue()


def decode_npz(data: bytes) -> Dict[str, np.ndarray]:
    with np.load(io.BytesIO(data)) as z:
        return {k: z[k] for k in z.files}
