#!/bin/bash
# Published-width (VERDICT r3 #6) TPU queue: place_adv ablation + bf16
# full-variant A/B at feature_dim 2048 / fc_dim 512 / batch 128-74-128.
# Strictly sequential — one TPU process at a time (CLAUDE.md).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
COMMON="--angle 60 --centroid_scale 4 --videos 1024 --num_class 4 \
  --epochs 120 --lr 0.05 --dropout 0 --beta -1 -1 -1 --gamma 0.003 \
  --fc_dim 512 --feature_dim 2048 --batch 128 74 128 --device_store \
  --seeds 0 1 2 --source_cache /tmp/src_cache_pub.json"

for PA in "Y N N" "N Y N" "N N Y" "N N N"; do
  tag=$(echo "$PA" | tr -d ' ')
  echo "=== place_adv $PA $(date -u) ==="
  timeout 3000 python scripts/da_wins_experiment.py $COMMON \
    --da_variant full --alpha 1.0 --place_adv $PA \
    > /tmp/da_pub_pa_$tag.log 2>&1
  echo "exit=$? tail:"; tail -2 /tmp/da_pub_pa_$tag.log
done

echo "=== bf16 full $(date -u) ==="
timeout 3000 python scripts/da_wins_experiment.py $COMMON \
  --da_variant full --alpha 1.0 --compute_dtype bfloat16 \
  > /tmp/da_pub_bf16.log 2>&1
echo "exit=$? tail:"; tail -2 /tmp/da_pub_bf16.log
echo "=== queue done $(date -u) ==="
