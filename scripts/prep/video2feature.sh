#!/bin/bash
# Feature-extraction driver (reference:
# dataset_preparation/script_video2feature.sh) — edit the variable block,
# then run.  Extracts per-frame CNN features for every video under
# $data_path/$video_in/CLASS/VIDEO and writes packed FeatureStore shards
# under $data_path/$feature_in (one dir per video; `--finalize` packs).
# ----------------------------------------------------------------------
data_path=/dataset/hmdb51/          # depend on users
video_in=RGB                        # raw input dir (videos or frame dirs)
feature_in=RGB-feature              # output feature dir
input_type=video                    # video | frames
batch_size=128
base_model=resnet101                # resnet18|34|50|101|152 | c3d
pretrain_weight=/models/resnet101.pth  # torch state_dict for the backbone
start_class=1                       # 1-based, inclusive
end_class=-1                        # -1: all classes
class_file=none                     # none | path to class_list_*.txt
# ----------------------------------------------------------------------

python -m ta3n_tpu.prep.video2feature \
  --data_path "$data_path" --video_in "$video_in" \
  --feature_in "$feature_in" --input_type "$input_type" \
  --batch_size "$batch_size" --base_model "$base_model" \
  --pretrain_weight "$pretrain_weight" \
  --start_class "$start_class" --end_class "$end_class" \
  --class_file "$class_file"
