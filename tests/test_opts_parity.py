"""CLI flag-surface parity: our parser's defaults must match the
reference opts.py defaults exactly (opts.py:1-119)."""

from ta3n_tpu.cli.opts import build_parser

# (flag dest, reference default) transcribed from opts.py
REFERENCE_DEFAULTS = {
    "arch": "resnet101",
    "pretrained": "none",
    "num_segments": 5,
    "val_segments": -1,
    "add_fc": 1,
    "fc_dim": 1024,
    "baseline_type": "frame",
    "frame_aggregation": "avgpool",
    "optimizer": "SGD",
    "dropout_i": 0.8,
    "dropout_v": 0.8,
    "loss_type": "nll",
    "weighted_class_loss": "N",
    "n_rnn": 1,
    "rnn_cell": "LSTM",
    "n_directions": 1,
    "n_ts": 5,
    "share_params": "Y",
    "use_target": "none",
    "dis_DA": "none",
    "adv_DA": "none",
    "use_bn": "none",
    "ens_DA": "none",
    "use_attn_frame": "none",
    "use_attn": "none",
    "n_attn": 1,
    "add_loss_DA": "none",
    "pred_normalize": "N",
    "alpha": 1,
    "beta": [1, 1, 1],
    "gamma": 1,
    "mu": 0,
    "weighted_class_loss_DA": "N",
    "place_dis": ["Y", "Y", "N"],
    "place_adv": ["Y", "Y", "Y"],
    "pretrain_source": False,
    "epochs": 100,
    "batch_size": [32, 28, 64],
    "lr": 0.0001,
    "lr_decay": 10,
    "lr_adaptive": "none",
    "lr_steps": [60, 100],
    "momentum": 0.9,
    "weight_decay": 1e-4,
    "clip_gradient": 20,
    "copy_list": ["N", "Y"],
    "print_freq": 10,
    "show_freq": 10,
    "eval_freq": 1,
    "verbose": False,
    "resume": "",
    "resume_hp": False,
    "evaluate": False,
    "exp_path": "",
    "flow_prefix": "",
    "save_model": False,
    "save_best_log": "best.log",
    "save_attention": -1,
    "tensorboard": False,
}

POSITIONALS = ["class.txt", "RGB", "src.txt", "tgt.txt", "val.txt"]


def test_defaults_match_reference():
    args = build_parser().parse_args(POSITIONALS)
    mismatches = {}
    for dest, want in REFERENCE_DEFAULTS.items():
        got = getattr(args, dest)
        if got != want:
            mismatches[dest] = (got, want)
    assert not mismatches, mismatches


def test_positionals_match_reference():
    args = build_parser().parse_args(POSITIONALS)
    assert args.class_file == "class.txt"
    assert args.modality == "RGB"
    assert args.train_source_list == "src.txt"
    assert args.train_target_list == "tgt.txt"
    assert args.val_list == "val.txt"
