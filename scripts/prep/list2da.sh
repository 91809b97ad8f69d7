#!/bin/bash
# UCF/HMDB official-split -> DA-subset driver (reference:
# dataset_preparation/script_list2DA.sh).  Filters an official split
# list down to the DA class subset, remaps labels to the DA class ids,
# and rewrites paths to the feature dirs.
# ----------------------------------------------------------------------
full_list=/dataset/ucf101_splits/trainlist01.txt   # official split list
out_list=list_ucf101_train_hmdb_ucf-feature.txt
class_list_full=data/ucf101_splits/classInd.txt    # full 101-class index
class_list_da=data/ucf101_splits/class_list_hmdb_ucf.txt  # DA subset
feature_root=/dataset/ucf101/RGB-feature           # optional path rewrite
# ----------------------------------------------------------------------

args=(--class_list_full "$class_list_full" --class_list_da "$class_list_da")
[ -n "$feature_root" ] && args+=(--feature_root "$feature_root")
python -m ta3n_tpu.prep.list2da "$full_list" "$out_list" "${args[@]}"
