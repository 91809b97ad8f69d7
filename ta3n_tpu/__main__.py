"""`python -m ta3n_tpu` — entry-point directory."""

HELP = """TA3N-TPU — TPU-native video domain adaptation

entry points:
  python -m ta3n_tpu.cli.train              train (opts.py-parity flags)
  python -m ta3n_tpu.cli.test_models        standalone evaluation
  python -m ta3n_tpu.cli.serve              HTTP serving
  python -m ta3n_tpu.cli.convert_features   .t7 layout -> packed store
  python -m ta3n_tpu.cli.import_checkpoint  torch .pth.tar -> orbax
  python -m ta3n_tpu.prep.video2feature     video -> features (on TPU)
  python -m ta3n_tpu.prep.dataset2split     train/val splitting
  python -m ta3n_tpu.prep.video_dataset2list  list manifests
  python -m ta3n_tpu.prep.list2da           DA class-subset filtering
  python -m ta3n_tpu.prep.video_processing  frame count / overlay

docs: README.md, PARITY.md, BENCH_NOTES.md, ROADMAP.md
"""

if __name__ == "__main__":
    print(HELP)
