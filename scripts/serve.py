#!/usr/bin/env python
"""Dependency-free HTTP inference server for trained SRGAN checkpoints.

Endpoints (bodies are ``np.savez`` archives, see srgan_tpu.serving):
  GET  /healthz              -> 200 "ok"
  POST /translate            body: images (N,H,W,3) in [-1,1],
                                   target_labels (N,), [latent (N,ndim)]
                             resp: fakes (N,H,W,3), latent (N,ndim)
  POST /encode               body: images [, labels]
                             resp: mu, logvar

Example client:
    import numpy as np, urllib.request
    from srgan_tpu.serving import encode_npz, decode_npz
    body = encode_npz(images=imgs, target_labels=np.full(len(imgs), 2))
    req = urllib.request.Request("http://localhost:8718/translate", body)
    out = decode_npz(urllib.request.urlopen(req).read())
    fakes = out["fakes"]
"""

import argparse
import sys
from http.server import ThreadingHTTPServer

try:  # installed via `pip install -e .`
    import srgan_tpu  # noqa: F401
except ImportError:  # running from a bare checkout
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srgan_tpu.configs import PRESETS, load_config_for_ckpt
from srgan_tpu.serving import Translator, make_handler


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", choices=sorted(PRESETS),
                help="fallback when the run dir has no config.json")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--ckpt-step", type=int)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8718)
    ap.add_argument("--warm-batch-sizes", type=int, nargs="+",
                    default=[1, 8, 32])
    args = ap.parse_args()

    cfg = load_config_for_ckpt(args.ckpt, args.preset)
    print("loading + warming compile cache ...", flush=True)
    translator = Translator(cfg, args.ckpt, step=args.ckpt_step,
                            warm_batch_sizes=args.warm_batch_sizes)
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(translator))
    print(f"serving {cfg.name} on http://{args.host}:{args.port}",
          flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
