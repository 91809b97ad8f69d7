#!/bin/bash
# Train/val split driver (reference:
# dataset_preparation/script_dataset2split.sh).  Copies (or moves) each
# class's videos into train/val subsets — either by random ratio or by
# an official split file (the reference's split_ratio<0 mode).
# ----------------------------------------------------------------------
data_root=/dataset/olympic/RGB      # depend on users
out_root=/dataset/olympic_split     # produces $out_root/{train,val}
ratio=0.8                           # train fraction (ignored w/ split_file)
split_file=                         # official train list (one id/line)
move=N                              # Y: move instead of copy (no 2x disk)
seed=1
# ----------------------------------------------------------------------

args=(--ratio "$ratio" --seed "$seed")
[ -n "$split_file" ] && args+=(--split_file "$split_file")
[ "$move" = "Y" ] && args+=(--move)
python -m ta3n_tpu.prep.dataset2split "$data_root" "$out_root" "${args[@]}"
