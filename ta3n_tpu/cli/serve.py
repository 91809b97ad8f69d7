"""Serving CLI: expose a trained TA3N model over HTTP.

    python -m ta3n_tpu.cli.serve CLASS_FILE WEIGHTS --fc_dim 512 \
        --frame_aggregation trn-m --test_segments 5 --port 8500
"""

from __future__ import annotations

import argparse

from ta3n_tpu.config import ModelConfig
from ta3n_tpu.data import load_class_names
from ta3n_tpu.serve import Predictor, run_http_server


def build_parser():
    p = argparse.ArgumentParser(description="TA3N-TPU serving")
    p.add_argument("class_file")
    p.add_argument("weights", help="checkpoint dir or reference .pth.tar")
    p.add_argument("--arch", default="resnet101")
    p.add_argument("--feature_dim", type=int, default=None)
    p.add_argument("--test_segments", type=int, default=5)
    p.add_argument("--add_fc", type=int, default=1)
    p.add_argument("--fc_dim", type=int, default=512)
    p.add_argument("--baseline_type", default="video")
    p.add_argument("--frame_aggregation", default="trn-m")
    p.add_argument("--use_attn", default="TransAttn")
    p.add_argument("--use_attn_frame", default="none")
    p.add_argument("--use_bn", default="none")
    p.add_argument("--share_params", default="Y")
    p.add_argument("--quantize", default="none", choices=["none", "int8"],
                   help="int8: W8A8 dynamically-quantized inference on the "
                        "MXU's int8 path (per-channel weight / per-row "
                        "activation scales; logits heads stay f32); baked "
                        "into --export artifacts via meta.json")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--top_k", type=int, default=5)
    p.add_argument("--data_parallel", default=False, action="store_true",
                   help="shard each request batch over all local devices "
                        "(1-D data mesh compiled into the predict program)")
    p.add_argument("--sweep_best", default=False, action="store_true",
                   help="when WEIGHTS is a sweep dir: serve each "
                        "member's best-validation state (model_best, "
                        "written by -ef sweeps) instead of its final "
                        "checkpoint")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8500)
    p.add_argument("--export", default=None, metavar="DIR",
                   help="write an AOT deployment artifact (StableHLO + "
                        "meta.json) to DIR and exit instead of serving; "
                        "WEIGHTS may later be given as DIR to serve it "
                        "without model code or checkpoint")
    p.add_argument("--export_platforms", nargs="+",
                   default=["cpu", "tpu"],
                   help="platforms the exported artifact must run on")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    class_names = load_class_names(args.class_file)
    mesh = None
    if args.data_parallel:
        from ta3n_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
    if Predictor.is_exported(args.weights):
        # WEIGHTS is a Predictor.export artifact: model flags are taken
        # from its meta.json, not the CLI
        predictor = Predictor.from_exported(args.weights, mesh=mesh)
    else:
        cfg = ModelConfig(
            num_class=len(class_names), baseline_type=args.baseline_type,
            frame_aggregation=args.frame_aggregation,
            train_segments=args.test_segments,
            val_segments=args.test_segments,
            base_model=args.arch, feature_dim=args.feature_dim,
            dropout_i=0.0, dropout_v=0.0, add_fc=args.add_fc,
            fc_dim=args.fc_dim, use_attn=args.use_attn,
            use_attn_frame=args.use_attn_frame, use_bn=args.use_bn,
            share_params=args.share_params, quantize=args.quantize)
        if args.sweep_best and not Predictor.is_sweep(args.weights):
            raise SystemExit(
                f"--sweep_best: {args.weights} is not a sweep output "
                "dir (no member_XX checkpoints) — for a solo training "
                "run point WEIGHTS at its model_best dir directly")
        if Predictor.is_sweep(args.weights):
            # WEIGHTS is a sweep output dir: serve ALL members as a
            # deep ensemble (member-averaged softmax, one vmapped pass)
            which = "model_best" if args.sweep_best else "checkpoint"
            predictor = Predictor.from_sweep(args.weights, cfg,
                                             which=which,
                                             batch_size=args.batch_size,
                                             top_k=args.top_k, mesh=mesh)
            print(f"ensemble serving: {predictor.n_members} members "
                  f"({which})")
        else:
            predictor = Predictor.from_checkpoint(
                args.weights, cfg, batch_size=args.batch_size,
                top_k=args.top_k, mesh=mesh)
    if args.export:
        out = predictor.export(args.export,
                               platforms=tuple(args.export_platforms))
        print(f"exported {predictor.cfg.num_class}-class predictor "
              f"(batch {predictor.batch_size}, platforms "
              f"{args.export_platforms}) to {out}")
        return
    run_http_server(predictor, class_names, args.host, args.port)


if __name__ == "__main__":
    main()
