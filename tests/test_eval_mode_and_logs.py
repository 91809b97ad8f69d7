"""Train-CLI --evaluate mode and the log-file resume contract."""

import os

from ta3n_tpu.io_utils.logs import AverageMeter, LogFiles


def test_train_cli_evaluate_mode(tmp_path):
    from ta3n_tpu.cli.train import main
    from ta3n_tpu.data.synthetic import make_domain_pair
    src, tgt, val = make_domain_pair(num_source=16, num_target=12,
                                     num_val=8, num_class=3,
                                     feature_dim=16, shift=0.5)
    for name, store in [("src", src), ("tgt", tgt), ("val", val)]:
        d = tmp_path / name
        store.save(str(d))
        with open(d / "list.txt", "w") as f:
            for r in store.records():
                f.write(f"{r.path} {r.num_frames} {r.label}\n")
    (tmp_path / "class.txt").write_text("0 a\n1 b\n2 c\n")

    args = [
        str(tmp_path / "class.txt"), "RGB",
        str(tmp_path / "src" / "list.txt"),
        str(tmp_path / "tgt" / "list.txt"),
        str(tmp_path / "val" / "list.txt"),
        "--exp_path", str(tmp_path / "exp") + "/",
        "--baseline_type", "video", "--frame_aggregation", "avgpool",
        "--num_segments", "3", "--val_segments", "3", "--fc_dim", "16",
        "--feature_dim", "16", "--epochs", "1", "-b", "8", "6", "8",
        "--save_model",
        "--save_best_log", str(tmp_path / "best.log"),
    ]
    main(args)  # one training epoch + checkpoint

    # --evaluate with --resume: validation only (main.py:210-214)
    prec1 = main(args + ["--evaluate", "--resume",
                         str(tmp_path / "exp") + "/RGB/checkpoint"])
    assert 0.0 <= prec1 <= 100.0


def test_logfiles_resume_separator(tmp_path):
    logs = LogFiles(str(tmp_path), resume=False,
                    best_log=str(tmp_path / "best.log"))
    logs.write("train.log", "epoch one line")
    logs.write_best(12.345)
    logs.close()

    logs2 = LogFiles(str(tmp_path), resume=True, start_epoch=2,
                     best_log=str(tmp_path / "best.log"))
    logs2.write("train.log", "epoch two line")
    logs2.write_best(23.456)
    logs2.close()

    content = (tmp_path / "train.log").read_text()
    assert "epoch one line" in content
    assert "========== start: 2" in content          # main.py:117-120
    assert content.index("epoch one line") < \
        content.index("========== start: 2") < \
        content.index("epoch two line")
    best = (tmp_path / "best.log").read_text().strip().split("\n")
    assert best == ["12.345", "23.456"]               # append-only


def test_average_meter_semantics():
    m = AverageMeter()
    m.update(2.0, 3)
    m.update(4.0, 1)
    assert m.val == 4.0
    assert m.count == 4
    assert m.avg == (2.0 * 3 + 4.0) / 4
