#!/bin/bash
# Manifest-building driver (reference:
# dataset_preparation/script_dataset2list.sh).  Scans a feature (or
# frame) tree and writes a `path num_frames class` list file, with
# optional class filtering (DA subsets) and per-class/per-video
# subsampling.
# ----------------------------------------------------------------------
data_root=/dataset/olympic_split/train   # depend on users
out_list=list_olympic_train.txt
class_list=                              # class_list_*.txt for DA subsets
sample_ratio=1.0                         # per-video random keep fraction
sample_per_class=-1                      # -1: all | N videos per class
seed=1
# ----------------------------------------------------------------------

args=(--sample_ratio "$sample_ratio" --sample_per_class "$sample_per_class"
      --seed "$seed")
[ -n "$class_list" ] && args+=(--class_list "$class_list")
python -m ta3n_tpu.prep.video_dataset2list "$data_root" "$out_list" \
  "${args[@]}"
