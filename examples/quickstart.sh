#!/bin/bash
# TA3N-TPU quickstart: the complete workflow on synthetic data, runnable
# on any machine (forces an 8-virtual-device CPU mesh — drop the env
# overrides on a real TPU host).  Steps: synthetic feature stores ->
# train (full TA3N, data-parallel mesh) -> resume -> standalone eval
# artifacts -> hyper-parameter sweep (one vmapped program) -> serve the
# sweep as a deep ensemble (AOT StableHLO artifact).
#
#   bash examples/quickstart.sh [WORKDIR]
set -euo pipefail

WS=$(realpath -m "${1:-$(mktemp -d)}")  # resolve BEFORE the cd below
cd "$(dirname "$0")/.."
export PYTHONPATH=.:${PYTHONPATH:-}
export PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=8"

echo "== 1. synthetic feature stores + manifests -> $WS"
python - "$WS" <<'EOF'
import os, sys
from ta3n_tpu.data.synthetic import make_domain_pair
ws = sys.argv[1]
src, tgt, val = make_domain_pair(num_source=40, num_target=30,
                                 num_val=20, num_class=3,
                                 feature_dim=32, shift=0.8)
for name, store in [("src", src), ("tgt", tgt), ("val", val)]:
    d = os.path.join(ws, name); store.save(d)
    with open(os.path.join(d, "list.txt"), "w") as f:
        for r in store.records():
            f.write(f"{r.path} {r.num_frames} {r.label}\n")
open(os.path.join(ws, "class.txt"), "w").write("0 a\n1 b\n2 c\n")
EOF

common=("$WS/class.txt" RGB "$WS/src/list.txt" "$WS/tgt/list.txt"
        "$WS/val/list.txt" --baseline_type video
        --frame_aggregation trn-m --num_segments 3 --val_segments 3
        --fc_dim 32 --feature_dim 32)

echo "== 2. train full TA3N (adversarial DA at all three levels)"
python -m ta3n_tpu.cli.train "${common[@]}" \
  --exp_path "$WS/exp/" --use_target uSv --adv_DA RevGrad \
  --use_attn TransAttn --add_loss_DA attentive_entropy --gamma 0.01 \
  --lr 0.1 --lr_adaptive dann --epochs 2 -b 16 12 16 --save_model -pf 1

echo "== 3. resume for one more epoch (exact RNG/sampler continuation)"
python -m ta3n_tpu.cli.train "${common[@]}" \
  --exp_path "$WS/exp/" --use_target uSv --adv_DA RevGrad \
  --use_attn TransAttn --add_loss_DA attentive_entropy --gamma 0.01 \
  --lr 0.1 --lr_adaptive dann --epochs 3 -b 16 12 16 --save_model -pf 1 \
  --resume "$WS/exp/RGB/checkpoint" --resume_hp

echo "== 4. standalone eval (top-K, confusion matrix, scores npz)"
python -m ta3n_tpu.cli.test_models "$WS/class.txt" RGB \
  "$WS/val/list.txt" "$WS/exp/RGB/model_best" \
  --test_segments 3 --fc_dim 32 --feature_dim 32 \
  --baseline_type video --frame_aggregation trn-m --use_attn TransAttn \
  --bS 8 --top 1 2 3 --save_confusion "$WS/exp/conf" \
  --save_scores "$WS/exp/scores"

echo "== 5. hyper-parameter sweep: 4 members as ONE vmapped program"
python -m ta3n_tpu.cli.sweep "${common[@]}" \
  --exp_path "$WS/sweep_exp/" --use_target uSv --adv_DA RevGrad \
  --use_attn TransAttn --lr 0.1 --epochs 2 -b 16 12 16 \
  --sweep_seeds 0 1 --sweep_lrs 0.1 0.01 \
  --sweep_dir "$WS/sweep" --sweep_mesh 4

echo "== 6. serve the sweep as a deep ensemble -> AOT artifact"
python -m ta3n_tpu.cli.serve "$WS/class.txt" "$WS/sweep" \
  --test_segments 3 --fc_dim 32 --feature_dim 32 --batch_size 8 \
  --use_attn TransAttn --export "$WS/ensemble_artifact"

echo "== done; artifacts under $WS"
ls "$WS"
