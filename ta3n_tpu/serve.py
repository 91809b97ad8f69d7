"""Inference / serving: a jitted batch predictor and a local HTTP endpoint.

The reference has no serving story (eval CLI only); this provides the
production path: load a checkpoint (ours or a reference .pth.tar), build a
fixed-shape jitted predict function (pad+mask for ragged request sizes),
and optionally expose it over HTTP for row-feature requests.

    predictor = Predictor.from_checkpoint(ckpt_dir, model_cfg)
    probs, topk = predictor(features)            # [N, S, D] -> [N, C]

    python -m ta3n_tpu.cli.serve CLASS_FILE WEIGHTS --port 8500 ...
"""

from __future__ import annotations

import json
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ta3n_tpu.config import ModelConfig
from ta3n_tpu.models import VideoModel

__all__ = ["Predictor"]


class Predictor:
    """Fixed-batch jitted inference with automatic padding."""

    def __init__(self, model_cfg: ModelConfig, params, batch_stats=None,
                 batch_size: int = 64, top_k: int = 5):
        self.cfg = model_cfg
        self.model = VideoModel(model_cfg)
        self.params = params
        self.batch_stats = batch_stats or {}
        self.batch_size = batch_size
        self.top_k = min(top_k, model_cfg.num_class)

        @jax.jit
        def _predict(x):
            variables = {"params": self.params}
            if self.batch_stats:
                variables["batch_stats"] = self.batch_stats
            _, out = self.model.apply(variables, x, x, jnp.zeros(3),
                                      jnp.asarray(0.0), False, False)
            logits = out.out
            if logits.ndim == 3:
                logits = jnp.mean(logits, axis=1)
            probs = jax.nn.softmax(logits, axis=-1)
            top_p, top_i = jax.lax.top_k(probs, self.top_k)
            return probs, top_p, top_i

        self._predict = _predict

    @classmethod
    def from_checkpoint(cls, weights: str, model_cfg: ModelConfig,
                        **kw) -> "Predictor":
        import os
        if os.path.isfile(weights):  # reference .pth.tar
            from ta3n_tpu.io_utils.torch_import import load_torch_checkpoint
            params, batch_stats, _ = load_torch_checkpoint(weights)
        else:
            from ta3n_tpu.io_utils.checkpoint import load_checkpoint
            payload = load_checkpoint(weights)
            params = payload["params"]
            batch_stats = payload.get("batch_stats", {})
        return cls(model_cfg, params, batch_stats, **kw)

    def __call__(self, features: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """features: [N, S, D] -> (probs [N,C], top_p [N,K], top_i [N,K])."""
        n = features.shape[0]
        b = self.batch_size
        probs, tps, tis = [], [], []

        def materialize(item):
            (p, tp, ti), real = jax.device_get(item[0]), item[1]
            probs.append(p[:real])
            tps.append(tp[:real])
            tis.append(ti[:real])

        # pipelined: dispatch chunk i+1 and start its async host copies
        # BEFORE blocking on chunk i, so fetch latency overlaps compute
        # (one transfer per chunk either way; per-array reads would each
        # be a blocking device roundtrip)
        in_flight = None
        for lo in range(0, n, b):
            chunk = np.asarray(features[lo:lo + b], np.float32)
            real = chunk.shape[0]
            if real < b:
                chunk = np.concatenate(
                    [chunk, np.zeros((b - real,) + chunk.shape[1:],
                                     np.float32)])
            res = self._predict(chunk)
            for arr in res:
                if hasattr(arr, "copy_to_host_async"):
                    arr.copy_to_host_async()
            if in_flight is not None:
                materialize(in_flight)
            in_flight = (res, real)
        if in_flight is not None:
            materialize(in_flight)
        return (np.concatenate(probs), np.concatenate(tps),
                np.concatenate(tis))


def run_http_server(predictor: Predictor, class_names, host: str,
                    port: int):
    """Minimal JSON-over-HTTP endpoint.

    POST /predict {"features": [[...S x D...], ...]} ->
      {"top_classes": [...], "top_probs": [...], "names": [...]}
    GET /healthz -> {"status": "ok"}
    """
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok",
                                 "num_class": predictor.cfg.num_class,
                                 "segments": predictor.cfg.val_segments})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length))
                feats = np.asarray(req["features"], np.float32)
                if feats.ndim != 3:
                    raise ValueError(
                        f"features must be [N, S, D]; got {feats.shape}")
                _, tp, ti = predictor(feats)
                self._send(200, {
                    "top_classes": ti.tolist(),
                    "top_probs": tp.tolist(),
                    "names": [[class_names[j] for j in row]
                              for row in ti.tolist()],
                })
            except Exception as e:  # noqa: BLE001 — report to client
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, *a):  # quiet
            pass

    server = HTTPServer((host, port), Handler)
    print(f"serving on http://{host}:{port} "
          f"(POST /predict, GET /healthz)")
    server.serve_forever()
