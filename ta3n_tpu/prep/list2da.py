"""Filter official full-dataset split lists down to the DA class subset.

Capability parity with `dataset_preparation/list_ucf_hmdb_full2DA.py`:
keep only videos whose class is in the shared DA class list, remap labels
to the DA label space, and rewrite paths to the feature tree.

Usage:
    python -m ta3n_tpu.prep.list2da FULL_LIST OUT_LIST \
        --class_list_full classInd_full.txt \
        --class_list_da data/classInd_hmdb_ucf.txt \
        --feature_root RGB-Feature/
"""

from __future__ import annotations

import argparse
import os


def load_id_to_name(class_file: str):
    out = {}
    with open(class_file) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            idx, name = line.split(" ", 1)
            out[int(idx)] = name
    return out


def convert(full_list: str, class_list_full: str, class_list_da: str,
            feature_root: str = ""):
    full_names = load_id_to_name(class_list_full)
    da_map = {name: idx for idx, name in
              load_id_to_name(class_list_da).items()}
    rows = []
    with open(full_list) as f:
        for line in f:
            parts = line.strip().split(" ")
            if len(parts) < 2:
                continue
            path, rest = parts[0], parts[1:]
            label_full = int(rest[-1])
            name = full_names.get(label_full)
            if name is None or name not in da_map:
                continue
            video = os.path.splitext(os.path.basename(path))[0]
            new_path = os.path.join(feature_root, video) if feature_root \
                else path
            n_frames = int(rest[0]) if len(rest) > 1 else 0
            rows.append((new_path, n_frames, da_map[name]))
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("full_list")
    p.add_argument("out_list")
    p.add_argument("--class_list_full", required=True)
    p.add_argument("--class_list_da", required=True)
    p.add_argument("--feature_root", default="")
    args = p.parse_args(argv)
    rows = convert(args.full_list, args.class_list_full, args.class_list_da,
                   args.feature_root)
    with open(args.out_list, "w") as f:
        for path, n, label in rows:
            f.write(f"{path} {n} {label}\n")
    print(f"kept {len(rows)} videos -> {args.out_list}")


if __name__ == "__main__":
    main()
