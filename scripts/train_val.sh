#!/bin/bash
# Experiment driver — parity with the reference `script_train_val.sh`
# (variable surface, published hyper-parameters, exp-path naming), invoking
# the TPU-native CLIs.  Point the *_store variables at packed FeatureStore
# dirs (ta3n_tpu.cli.convert_features / ta3n_tpu.prep.video2feature).

#====== parameters ======#
dataset=hmdb_ucf # hmdb_ucf | hmdb_ucf_small | ucf_olympic
class_file=${TA3N_CLASS_FILE:-data/classInd_${dataset}.txt}
training=${TA3N_TRAINING:-true}
testing=${TA3N_TESTING:-false}
modality=RGB
num_segments=${TA3N_SEGMENTS:-5}
test_segments=${TA3N_SEGMENTS:-5}
baseline_type=video
frame_aggregation=trn-m # avgpool | trn | trn-m | rnn | temconv
add_fc=1
fc_dim=${TA3N_FC_DIM:-512}
feature_dim=${TA3N_FEATURE_DIM:-2048}
epochs=${TA3N_EPOCHS:-30}
arch=resnet101
use_target=uSv # none | Sv | uSv
share_params=Y

#====== data (depend on users) ======#
path_data_root=${TA3N_DATA_ROOT:-./dataset}
train_source_list=$path_data_root/source/list.txt
train_target_list=$path_data_root/target/list.txt
val_list=$path_data_root/val/list.txt
source_store=$path_data_root/source
target_store=$path_data_root/target
val_store=$path_data_root/val
exp_path=${TA3N_EXP_ROOT:-./exp}

#====== DA algorithm parameters (published: script_train_val.sh:73-101) ======#
dis_DA=none     # none | DAN | JAN | CORAL
alpha=0
adv_pos_0=Y
adv_DA=RevGrad
beta_0=0.75     # U->H: 0.75 | H->U: 1
beta_1=0.75
beta_2=0.5
use_attn=TransAttn
n_attn=1
use_attn_frame=none
use_bn=none     # none | AdaBN | AutoDIAL
add_loss_DA=attentive_entropy
gamma=0.003     # U->H: 0.003 | H->U: 0.3
ens_DA=none     # none | MCD
mu=0

bS=${TA3N_BS:-128}
bS_2=$(python -c "print(int($bS * $(wc -l < "$train_target_list") / $(wc -l < "$train_source_list")))")
lr=3e-2
optimizer=SGD

if [ "$use_target" == "none" ]; then
    dis_DA=none; alpha=0; adv_pos_0=N; adv_DA=none
    beta_0=0; beta_1=0; beta_2=0
    use_attn=none; use_attn_frame=none; use_bn=none
    add_loss_DA=none; gamma=0; ens_DA=none; mu=0
    exp_full=$exp_path'-baseline/'$dataset'-'$num_segments'seg/'
else
    exp_full=$exp_path'-DA-'$optimizer'-lr_'$lr'-bS_'$bS'_'$bS_2'/'$dataset'-'$num_segments'seg-disDA_'$dis_DA'-advDA_'$adv_DA'-beta_'$beta_0'_'$beta_1'_'$beta_2'-useBN_'$use_bn'-addlossDA_'$add_loss_DA'-gamma_'$gamma'-useAttn_'$use_attn'/'
fi
echo "exp_path: $exp_full"

if ($training); then
    val_segments=$test_segments
    python -m ta3n_tpu.cli.train "$class_file" $modality \
        "$train_source_list" "$train_target_list" "$val_list" \
        --store_source "$source_store" --store_target "$target_store" \
        --store_val "$val_store" --exp_path "$exp_full" \
        --arch $arch --baseline_type $baseline_type \
        --frame_aggregation $frame_aggregation \
        --num_segments $num_segments --val_segments $val_segments \
        --add_fc $add_fc --fc_dim $fc_dim --feature_dim $feature_dim --dropout_i 0.5 --dropout_v 0.5 \
        --use_target $use_target --share_params $share_params \
        --dis_DA $dis_DA --alpha $alpha --place_dis N Y N \
        --adv_DA $adv_DA --beta $beta_0 $beta_1 $beta_2 \
        --place_adv $adv_pos_0 Y Y \
        --use_bn $use_bn --add_loss_DA $add_loss_DA --gamma $gamma \
        --ens_DA $ens_DA --mu $mu \
        --use_attn $use_attn --n_attn $n_attn \
        --use_attn_frame $use_attn_frame \
        --gd 20 --lr $lr --lr_decay 10 --lr_adaptive dann \
        --lr_steps 10 20 --epochs $epochs --optimizer $optimizer \
        --n_rnn 1 --rnn_cell LSTM --n_directions 1 --n_ts 5 \
        -b $bS $bS_2 $bS -ef 1 -pf 50 -sf 50 --copy_list N N \
        --device_store --steps_per_call 8 --device_sampler --save_model
fi

if ($testing); then
    model=model_best # checkpoint | model_best
    python -m ta3n_tpu.cli.test_models "$class_file" $modality \
        "$val_list" "$exp_full$modality/$model" --store "$val_store" \
        --arch $arch --test_segments $test_segments \
        --save_scores "$exp_full$modality/scores_${dataset}-$model" \
        --save_confusion "$exp_full$modality/confusion_${dataset}-$model" \
        --n_rnn 1 --rnn_cell LSTM --n_directions 1 --n_ts 5 \
        --use_attn $use_attn --n_attn $n_attn \
        --use_attn_frame $use_attn_frame --use_bn $use_bn \
        --share_params $share_params \
        --bS 512 --top 1 3 5 --add_fc 1 --fc_dim $fc_dim --feature_dim $feature_dim \
        --baseline_type $baseline_type \
        --frame_aggregation $frame_aggregation
fi
