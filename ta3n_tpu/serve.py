"""Inference / serving: a jitted batch predictor and a local HTTP endpoint.

The reference has no serving story (eval CLI only); this provides the
production path: load a checkpoint (ours or a reference .pth.tar), build a
fixed-shape jitted predict function (pad+mask for ragged request sizes),
and optionally expose it over HTTP for row-feature requests.

    predictor = Predictor.from_checkpoint(ckpt_dir, model_cfg)
    probs, topk = predictor(features)            # [N, S, D] -> [N, C]

    python -m ta3n_tpu.cli.serve CLASS_FILE WEIGHTS --port 8500 ...

int8 quantized inference: pass a ``ModelConfig`` with ``quantize='int8'``
(CLI ``--quantize int8``) and every MXU-sized GEMM runs as a W8A8
int8 x int8 -> int32 dot (models/layers.py); the setting rides the model
config into AOT artifacts via meta.json.

AOT deployment artifacts: ``Predictor.export(dir)`` serializes the whole
predict function (weights baked in) as a multi-platform StableHLO module
via ``jax.export`` plus a JSON sidecar with the model config, and
``Predictor.from_exported(dir)`` serves it WITHOUT the model code or
checkpoint — version-stable deployment the reference (which pickles a
torch state_dict and re-imports models.py at load time) has no analogue
for.  Exported traces force the XLA TRN path (models/trn.py
``force_xla_trn``) so the artifact carries no backend-pinned custom
calls and runs on any listed platform.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ta3n_tpu.config import ModelConfig
from ta3n_tpu.models import VideoModel

__all__ = ["Predictor"]

_EXPORT_BIN = "predict.stablehlo"
_EXPORT_META = "meta.json"


class Predictor:
    """Fixed-batch jitted inference with automatic padding.

    ``mesh=`` shards each request batch over a ``jax.sharding.Mesh``
    (data-parallel serving over ICI — the reference's only multi-device
    inference is DataParallel replication, test_models.py:108).  The
    sharding is compiled into the predict program; ``batch_size`` is
    rounded up to a device multiple so every chip gets equal rows.
    """

    def __init__(self, model_cfg: ModelConfig, params, batch_stats=None,
                 batch_size: int = 64, top_k: int = 5, mesh=None,
                 n_members: int = 0):
        self.cfg = model_cfg
        self.model = VideoModel(model_cfg)
        self.params = params
        self.batch_stats = batch_stats or {}
        self.mesh = mesh
        # n_members > 0: params/batch_stats leaves carry a leading member
        # axis — ensemble inference (softmax averaged over members)
        self.n_members = n_members
        if mesh is not None:
            from ta3n_tpu.parallel.mesh import pad_to_multiple
            batch_size = pad_to_multiple(batch_size, mesh.devices.size)
        self.batch_size = batch_size
        self.top_k = min(top_k, model_cfg.num_class)
        self._predict = self._jit(self._make_predict_fn())

    def _jit(self, fn):
        if self.mesh is None:
            return jax.jit(fn)
        from ta3n_tpu.parallel.mesh import batch_sharding
        return jax.jit(fn, in_shardings=batch_sharding(self.mesh))

    def _make_predict_fn(self):
        def _probs(params, batch_stats, x):
            variables = {"params": params}
            if self.batch_stats:
                variables["batch_stats"] = batch_stats
            _, out = self.model.apply(variables, x, x, jnp.zeros(3),
                                      jnp.asarray(0.0), False, False)
            logits = out.out
            if logits.ndim == 3:
                logits = jnp.mean(logits, axis=1)
            return jax.nn.softmax(logits, axis=-1)

        def _predict(x):
            if self.n_members:
                # ensemble inference: every member scores the batch in
                # one vmapped pass; probabilities are averaged (softmax
                # ensembling — the standard deep-ensemble reduction)
                probs = jax.vmap(_probs, in_axes=(0, 0, None))(
                    self.params, self.batch_stats, x)
                probs = jnp.mean(probs, axis=0)
            else:
                probs = _probs(self.params, self.batch_stats, x)
            top_p, top_i = jax.lax.top_k(probs, self.top_k)
            return probs, top_p, top_i

        return _predict

    # ---- AOT deployment artifacts -------------------------------------

    def export(self, path: str, platforms=("cpu", "tpu")) -> str:
        """Serialize the predict function (weights baked in as constants)
        to ``path/predict.stablehlo`` + ``path/meta.json``.

        The artifact is platform-portable across `platforms` and is served
        by `Predictor.from_exported` with no model code or checkpoint.
        A fresh trace is taken under `force_xla_trn` so no Pallas custom
        call pins the module to one backend.
        """
        from jax import export as jax_export
        from ta3n_tpu.models.trn import force_xla_trn

        if self.model is None:
            raise ValueError("this Predictor was loaded from an exported "
                             "artifact; re-export from the checkpoint")
        os.makedirs(path, exist_ok=True)
        s = self.cfg.val_segments * self.cfg.sample_new_length
        spec = jax.ShapeDtypeStruct(
            (self.batch_size, s, self.cfg.input_feature_dim), jnp.float32)
        with force_xla_trn():
            exported = jax_export.export(
                jax.jit(self._make_predict_fn()),
                platforms=tuple(platforms))(spec)
        with open(os.path.join(path, _EXPORT_BIN), "wb") as f:
            f.write(exported.serialize())
        meta = {
            "model_cfg": dataclasses.asdict(self.cfg),
            "batch_size": self.batch_size,
            "top_k": self.top_k,
            "platforms": list(platforms),
            "input_shape": list(spec.shape),
            "n_members": self.n_members,
        }
        with open(os.path.join(path, _EXPORT_META), "w") as f:
            json.dump(meta, f, indent=1)
        return path

    @staticmethod
    def is_exported(path: str) -> bool:
        return os.path.isfile(os.path.join(path, _EXPORT_BIN))

    @classmethod
    def from_exported(cls, path: str, mesh=None) -> "Predictor":
        """Serve a `Predictor.export` artifact: no model code, no
        checkpoint — the StableHLO module carries the weights.

        ``mesh=`` batch-shards each request over the mesh: the exported
        module is inlined at trace time, so GSPMD partitions it like a
        live predict function.  The artifact's batch size must already be
        a device multiple (export with one if you plan to shard).
        """
        from jax import export as jax_export

        with open(os.path.join(path, _EXPORT_META)) as f:
            meta = json.load(f)
        with open(os.path.join(path, _EXPORT_BIN), "rb") as f:
            exported = jax_export.deserialize(f.read())
        self = cls.__new__(cls)
        self.cfg = ModelConfig(**meta["model_cfg"])
        self.model = None
        self.params = None
        self.batch_stats = {}
        self.mesh = mesh
        self.n_members = int(meta.get("n_members", 0))
        self.batch_size = int(meta["batch_size"])
        if mesh is not None and self.batch_size % mesh.devices.size:
            raise ValueError(
                f"exported batch size {self.batch_size} is not divisible "
                f"by the {mesh.devices.size}-device mesh; re-export with "
                f"a device-multiple batch size")
        self.top_k = int(meta["top_k"])
        self._predict = self._jit(exported.call)
        return self

    @staticmethod
    def is_sweep(path: str) -> bool:
        return os.path.isdir(path) and (
            os.path.isfile(os.path.join(path, "sweep.json"))
            or bool(__import__("glob").glob(
                os.path.join(path, "member_*", "checkpoint"))))

    @classmethod
    def from_sweep(cls, sweep_dir: str, model_cfg: ModelConfig,
                   members=None, which: str = "checkpoint",
                   **kw) -> "Predictor":
        """Ensemble predictor over a sweep output (cli.sweep
        --sweep_dir / ensemble_sweep --save_dir): loads every
        member_XX/<which> (or just `members`, a sequence of member
        indices), stacks the parameter trees on a leading member axis,
        and serves the member-averaged softmax in one vmapped pass —
        deep-ensemble inference the reference has no analogue for.
        ``which="model_best"`` serves each member's best-validation
        epoch (written by eval_freq sweeps) instead of its final
        state."""
        import glob as _glob

        from ta3n_tpu.io_utils.checkpoint import load_checkpoint

        if which not in ("checkpoint", "model_best"):
            raise ValueError(f"which={which!r}: expected 'checkpoint' "
                             "or 'model_best'")
        if members is not None:
            dirs = [os.path.join(sweep_dir, f"member_{int(k):02d}",
                                 which) for k in members]
        else:
            dirs = sorted(_glob.glob(
                os.path.join(sweep_dir, "member_*", which)))
            if which == "model_best":
                # refuse to silently serve a smaller ensemble: members
                # without a model_best (no -ef sweep, partial copy,
                # preempted before their first eval) must be explicit
                have = {os.path.basename(os.path.dirname(d))
                        for d in dirs}
                all_m = {os.path.basename(os.path.dirname(d))
                         for d in _glob.glob(os.path.join(
                             sweep_dir, "member_*", "checkpoint"))}
                missing = sorted(all_m - have)
                if missing:
                    raise FileNotFoundError(
                        f"{missing} have no model_best under "
                        f"{sweep_dir} (model_best is written by "
                        "eval_freq>0 sweeps) — serve the final states "
                        "instead, or pass members= to select the "
                        "members that have one")
        if not dirs:
            raise FileNotFoundError(
                f"no member_*/{which} under {sweep_dir}"
                + (" (model_best is written by eval_freq>0 sweeps)"
                   if which == "model_best" else ""))
        payloads = [load_checkpoint(d) for d in dirs]

        def stack(trees):
            return jax.tree_util.tree_map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]), *trees)

        params = stack([p["params"] for p in payloads])
        bs_list = [p.get("batch_stats") or {} for p in payloads]
        if any(bs_list) and not all(bs_list):
            raise ValueError(
                "member checkpoints disagree on batch_stats presence "
                f"(members with stats: "
                f"{[i for i, b in enumerate(bs_list) if b]}) — the "
                "sweep dir mixes incompatible models")
        batch_stats = stack(bs_list) if any(bs_list) else {}
        return cls(model_cfg, params, batch_stats,
                   n_members=len(dirs), **kw)

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
