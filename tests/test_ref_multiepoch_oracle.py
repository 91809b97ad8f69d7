"""Multi-epoch composition oracle vs the ACTUAL reference main() loop.

The 4-step oracle (test_ref_oracle.py) can't see what composes ACROSS
epochs; this pins 3 full epochs of the reference's own epoch loop —
lr_steps decay firing between epochs (main.py:231-237 via the reference's
own adjust_learning_rate), the alpha<0 ramp (main.py:231), the per-step
DANN beta schedule whose start_steps = epoch*len(source_loader) advances
with the epoch (main.py:347-352), AdaBN running-stat drift feeding each
epoch's validate() (models.py:490-543 -> main.py:669-761) — against our
Trainer running its REAL fit() composition (train/loop.py:_fit) on
byte-identical batch streams.

Asserted per epoch: the applied lr, the epoch-average classification
loss, every per-step total loss, and validate()'s top-1; at the end, the
full parameter + BN-running-stat trees through the weight importer.
"""

import math
import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
from ta3n_tpu.data.feature_store import FeatureStore
from ta3n_tpu.data.loader import TSNLoader
from ta3n_tpu.io_utils.torch_import import import_torch_state_dict
from ta3n_tpu.train import TrainState
from ta3n_tpu.train.loop import Trainer
from ta3n_tpu.train.step import _build_tx

from tests import ref_harness

B_S, B_T, S, D, FC, C = 6, 4, 5, 24, 16, 6
N_SRC, N_TGT, N_VAL = 18, 12, 12        # 3 train batches, 2 val batches
EPOCHS = 3
LR = 0.03
NF = 9                                   # frames per fixture video

ARGV = [
    "--arch", "resnet101", "--num_segments", str(S),
    "--val_segments", str(S), "--add_fc", "1", "--fc_dim", str(FC),
    "--baseline_type", "video", "--dropout_i", "0", "--dropout_v", "0",
    "--lr", str(LR), "--optimizer", "SGD", "--lr_adaptive", "none",
    "--lr_steps", "2", "3", "--lr_decay", "10",
    "-b", str(B_S), str(B_T), str(B_S), "-j", "0",
    "-pf", "1000", "-sf", "1000", "--epochs", str(EPOCHS),
    "--eval_freq", "1",
    # composition-heavy DA config: DANN beta schedule (beta<0), alpha<0
    # ramp weighting DAN, AdaBN running stats, adversarial heads
    "--frame_aggregation", "avgpool", "--use_target", "uSv",
    "--use_bn", "AdaBN", "--adv_DA", "RevGrad",
    "--place_adv", "Y", "Y", "Y", "--use_attn", "none",
    "--dis_DA", "DAN", "--place_dis", "Y", "Y", "N",
    "--alpha", "-1", "--beta", "-1", "-1", "-1",
]


def _store(rng, n_videos, label_mod):
    feats = [rng.normal(size=(NF, D)).astype(np.float32)
             for _ in range(n_videos)]
    paths = [f"v{i}" for i in range(n_videos)]
    labels = [i % label_mod for i in range(n_videos)]
    return FeatureStore.from_arrays(feats, paths, labels)


def _loader(store, batch):
    return TSNLoader(store, batch_size=batch, num_segments=S,
                     new_length=1, mode="test", shuffle=False)


def _to_torch(loader):
    """Materialize the loader's (deterministic) epoch as the torch batch
    list the reference's train()/validate() consume."""
    out = []
    for b in loader.epoch():
        assert b.mask.all()
        out.append((torch.from_numpy(np.asarray(b.features)),
                    torch.from_numpy(b.labels.astype(np.int64))))
    return out


class _RecordingTrainer(Trainer):
    """The real Trainer with per-epoch observables captured from fit()."""

    rec_loss_c: list
    rec_lr: list
    rec_prec1: list

    def train_epoch(self, epoch):
        loss_c = super().train_epoch(epoch)
        self.rec_lr.append(self.lr_current)
        self.rec_loss_c.append(loss_c)
        return loss_c

    def validate(self, epoch):
        p = super().validate(epoch)
        self.rec_prec1.append(p)
        return p


def test_three_epoch_composition_matches_reference(tmp_path):
    ref_harness.set_feature_dim(D)
    args = ref_harness.make_args(ARGV)
    ns = ref_harness.load_reference()

    rng = np.random.default_rng(42)
    store_s = _store(rng, N_SRC, C)
    store_t = _store(rng, N_TGT, C)
    store_v = _store(rng, N_VAL, C)
    src_t = _to_torch(_loader(store_s, B_S))
    tgt_t = _to_torch(_loader(store_t, B_T))
    val_t = _to_torch(_loader(store_v, B_S))
    assert len(src_t) == len(tgt_t) == 3 and len(val_t) == 2

    # ---- reference: its own epoch loop (main.py:228-260) ----
    dp = ref_harness.build_ref_model(args, C)
    state0 = ref_harness.state_dict_numpy(dp)
    optimizer = ref_harness.build_optimizer(args, dp)
    ref_step_losses, ref_loss_c, ref_lr, ref_prec1 = [], [], [], []
    for epoch in range(1, EPOCHS + 1):
        alpha = (2 / (1 + math.exp(-1 * epoch / args.epochs)) - 1
                 if args.alpha < 0 else args.alpha)          # main.py:231
        if args.lr_adaptive == 'none' and epoch in args.lr_steps:
            ns.main.adjust_learning_rate(optimizer, args.lr_decay)
        losses, loss_c = ref_harness.ref_train(
            args, dp, C, src_t, tgt_t, optimizer=optimizer, alpha=alpha,
            epoch=epoch)
        ref_step_losses.append(losses)
        ref_loss_c.append(loss_c)
        ref_lr.append(optimizer.param_groups[0]["lr"])
        ref_prec1.append(ref_harness.ref_validate(args, dp, C, val_t,
                                                  epoch=epoch))

    # lr_steps actually fired: 0.03 -> 0.003 (epoch 2) -> 0.0003 (epoch 3)
    np.testing.assert_allclose(ref_lr, [LR, LR / 10, LR / 100], rtol=1e-9)

    # ---- ours: the real Trainer.fit() on identical streams ----
    model_cfg = ModelConfig(
        num_class=C, baseline_type="video", frame_aggregation="avgpool",
        train_segments=S, val_segments=S, fc_dim=FC, feature_dim=D,
        dropout_i=0.0, dropout_v=0.0, use_bn="AdaBN", use_attn="none")
    da_cfg = DAConfig(use_target="uSv", adv_DA="RevGrad",
                      dis_DA="DAN", place_dis=("Y", "Y", "N"),
                      place_adv=("Y", "Y", "Y"))
    train_cfg = TrainConfig(
        optimizer="SGD", lr=LR, lr_adaptive="none", lr_steps=(2.0, 3.0),
        lr_decay=10.0, epochs=EPOCHS, batch_size=(B_S, B_T, B_S),
        alpha=-1.0, beta=(-1.0, -1.0, -1.0))

    trainer = _RecordingTrainer(
        model_cfg, da_cfg, train_cfg,
        _loader(store_s, B_S), _loader(store_t, B_T), _loader(store_v, B_S),
        path_exp=os.path.join(str(tmp_path), "exp/"),
        use_mesh=False, print_freq=1000, show_freq=1000, eval_freq=1,
        save_model=False, nan_guard=False)
    trainer.rec_loss_c, trainer.rec_lr, trainer.rec_prec1 = [], [], []

    # start from the reference's init (oracle contract)
    params, batch_stats = import_torch_state_dict(state0)
    tx = _build_tx(train_cfg)
    trainer.state = TrainState(params, batch_stats, tx.init(params),
                               jnp.asarray(0, jnp.int32))
    our_step_losses = []
    orig_step = trainer.train_step

    def recording_step(st, *a):
        new_st, m = orig_step(st, *a)
        our_step_losses.append(m["loss"])
        return new_st, m

    trainer.train_step = recording_step
    trainer.fit()

    # ---- per-epoch composition ----
    np.testing.assert_allclose(trainer.rec_lr, ref_lr, rtol=1e-9,
                               err_msg="applied lr after lr_steps decay")
    np.testing.assert_allclose(trainer.rec_loss_c, ref_loss_c, rtol=5e-4,
                               err_msg="per-epoch avg classification loss")
    np.testing.assert_allclose(trainer.rec_prec1, ref_prec1, atol=1e-3,
                               err_msg="per-epoch validate top-1 "
                                       "(AdaBN running-stat composition)")
    ours_flat = [float(x) for x in our_step_losses]
    refs_flat = [loss for ep in ref_step_losses for loss in ep]
    assert len(ours_flat) == len(refs_flat) == EPOCHS * 3
    np.testing.assert_allclose(ours_flat, refs_flat, rtol=1e-3,
                               err_msg="per-step total losses, 3 epochs")

    # ---- end state: params + BN running stats through the importer ----
    import jax
    ref_params, ref_stats = import_torch_state_dict(
        ref_harness.state_dict_numpy(dp))
    for (path, v) in jax.tree_util.tree_flatten_with_path(
            trainer.state.params)[0]:
        r = {k: x for k, x in jax.tree_util.tree_flatten_with_path(
            ref_params)[0]}[path]
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(r), rtol=2e-3, atol=5e-5,
            err_msg=f"param {jax.tree_util.keystr(path)} after 3 epochs")
    for (path, v) in jax.tree_util.tree_flatten_with_path(
            trainer.state.batch_stats)[0]:
        r = {k: x for k, x in jax.tree_util.tree_flatten_with_path(
            ref_stats)[0]}[path]
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(r), rtol=2e-3, atol=5e-5,
            err_msg=f"BN stat {jax.tree_util.keystr(path)} after 3 epochs")


DANN_LR_ARGV = [
    "--arch", "resnet101", "--num_segments", str(S),
    "--val_segments", str(S), "--add_fc", "1", "--fc_dim", str(FC),
    "--baseline_type", "video", "--dropout_i", "0", "--dropout_v", "0",
    "--lr", str(LR), "--optimizer", "SGD", "--lr_adaptive", "dann",
    "-b", str(B_S), str(B_T), str(B_S), "-j", "0",
    "-pf", "1000", "-sf", "1000", "--epochs", str(EPOCHS),
    "--eval_freq", "1",
    "--frame_aggregation", "avgpool", "--use_target", "uSv",
    "--adv_DA", "RevGrad", "--place_adv", "Y", "Y", "Y",
    "--use_attn", "none", "--beta", "-1", "-1", "-1",
]


def test_dann_lr_composition_across_epochs(tmp_path):
    """The published flagship's per-step lr schedule (lr_adaptive dann,
    main.py:619-621,800-802) mutates the lr AFTER each step, so epoch
    N+1's first step runs at the lr set by epoch N's LAST progress value
    — a carry-over the single-epoch oracle can't see.  3 epochs of the
    reference loop vs our Trainer.fit(); per-step total losses pinned."""
    ref_harness.set_feature_dim(D)
    args = ref_harness.make_args(DANN_LR_ARGV)

    rng = np.random.default_rng(43)
    store_s = _store(rng, N_SRC, C)
    store_t = _store(rng, N_TGT, C)
    store_v = _store(rng, N_VAL, C)
    src_t = _to_torch(_loader(store_s, B_S))
    tgt_t = _to_torch(_loader(store_t, B_T))
    val_t = _to_torch(_loader(store_v, B_S))

    dp = ref_harness.build_ref_model(args, C)
    state0 = ref_harness.state_dict_numpy(dp)
    optimizer = ref_harness.build_optimizer(args, dp)
    ref_losses, ref_lr_end = [], []
    for epoch in range(1, EPOCHS + 1):
        losses, _ = ref_harness.ref_train(
            args, dp, C, src_t, tgt_t, optimizer=optimizer,
            alpha=args.alpha, epoch=epoch)
        ref_losses.extend(losses)
        ref_lr_end.append(optimizer.param_groups[0]["lr"])
    assert ref_lr_end[0] != ref_lr_end[-1]  # the schedule actually moved

    model_cfg = ModelConfig(
        num_class=C, baseline_type="video", frame_aggregation="avgpool",
        train_segments=S, val_segments=S, fc_dim=FC, feature_dim=D,
        dropout_i=0.0, dropout_v=0.0, use_attn="none")
    da_cfg = DAConfig(use_target="uSv", adv_DA="RevGrad",
                      place_adv=("Y", "Y", "Y"))
    train_cfg = TrainConfig(
        optimizer="SGD", lr=LR, lr_adaptive="dann", epochs=EPOCHS,
        batch_size=(B_S, B_T, B_S), beta=(-1.0, -1.0, -1.0))
    trainer = _RecordingTrainer(
        model_cfg, da_cfg, train_cfg,
        _loader(store_s, B_S), _loader(store_t, B_T), _loader(store_v, B_S),
        path_exp=os.path.join(str(tmp_path), "exp/"),
        use_mesh=False, print_freq=1000, show_freq=1000, eval_freq=1,
        save_model=False, nan_guard=False)
    trainer.rec_loss_c, trainer.rec_lr, trainer.rec_prec1 = [], [], []
    params, batch_stats = import_torch_state_dict(state0)
    tx = _build_tx(train_cfg)
    trainer.state = TrainState(params, batch_stats, tx.init(params),
                               jnp.asarray(0, jnp.int32))
    our_losses = []
    orig_step = trainer.train_step

    def recording_step(st, *a):
        new_st, m = orig_step(st, *a)
        our_losses.append(m["loss"])
        return new_st, m

    trainer.train_step = recording_step
    trainer.fit()

    np.testing.assert_allclose(trainer.rec_lr, ref_lr_end, rtol=1e-6,
                               err_msg="dann lr at each epoch end")
    np.testing.assert_allclose([float(x) for x in our_losses], ref_losses,
                               rtol=1e-3,
                               err_msg="per-step losses under dann lr")


EPOCHS_P = 4      # loss blows up after epochs 2 and 3 -> decay fires TWICE
LR_P = 10.0       # deliberately divergent so loss_c decisively goes UP


def test_loss_plateau_lr_composition_across_epochs(tmp_path):
    """lr_adaptive='loss' (main.py:222-223,234-235,794-798): lr divides
    by lr_decay at the START of an epoch when the previous epoch's
    average classification loss exceeded the one before it — including
    the 999/999 sentinel init that keeps epoch 1 (999 vs 999) and
    epoch 2 (loss vs 999) undecayed.  A divergent lr makes the
    reference's own loss_c rise after epochs 2 AND 3 with margins >>
    any cross-arm noise (probed: rises of ~1.7 and ~79), so the decay
    fires twice on both arms: lr 10 -> 10 -> 1 -> 0.1.  The applied-lr
    sequence is the composition observable and is pinned exactly;
    per-epoch loss_c only loosely (an lr-10 trajectory amplifies f32
    rounding chaotically)."""
    ref_harness.set_feature_dim(D)
    torch.manual_seed(0)    # reproducible init (both arms share it)
    argv = [
        "--arch", "resnet101", "--num_segments", str(S),
        "--val_segments", str(S), "--add_fc", "1", "--fc_dim", str(FC),
        "--baseline_type", "video", "--dropout_i", "0", "--dropout_v", "0",
        "--lr", str(LR_P), "--optimizer", "SGD", "--lr_adaptive", "loss",
        "--lr_decay", "10",
        "-b", str(B_S), str(B_T), str(B_S), "-j", "0",
        "-pf", "1000", "-sf", "1000", "--epochs", str(EPOCHS_P),
        "--eval_freq", "1",
        "--frame_aggregation", "avgpool", "--use_target", "uSv",
        "--adv_DA", "RevGrad", "--place_adv", "Y", "Y", "Y",
        "--use_attn", "none", "--beta", "1", "1", "1",
    ]
    args = ref_harness.make_args(argv)
    ns = ref_harness.load_reference()

    rng = np.random.default_rng(42)
    store_s = _store(rng, N_SRC, C)
    store_t = _store(rng, N_TGT, C)
    store_v = _store(rng, N_VAL, C)
    src_t = _to_torch(_loader(store_s, B_S))
    tgt_t = _to_torch(_loader(store_t, B_T))
    val_t = _to_torch(_loader(store_v, B_S))

    # ---- reference: its own plateau rule around its own train() ----
    dp = ref_harness.build_ref_model(args, C)
    state0 = ref_harness.state_dict_numpy(dp)
    optimizer = ref_harness.build_optimizer(args, dp)
    loss_c_current = loss_c_previous = 999     # main.py:222-223
    ref_lr, ref_loss_c = [], []
    for epoch in range(1, EPOCHS_P + 1):
        ns.main.adjust_learning_rate_loss(           # main.py:234-235
            optimizer, args.lr_decay, loss_c_current, loss_c_previous,
            '>')
        _, loss_c = ref_harness.ref_train(
            args, dp, C, src_t, tgt_t, optimizer=optimizer,
            alpha=args.alpha, epoch=epoch)
        loss_c_previous = loss_c_current             # main.py:247-248
        loss_c_current = loss_c
        ref_lr.append(optimizer.param_groups[0]["lr"])
        ref_loss_c.append(loss_c)

    assert ref_lr == [LR_P, LR_P, LR_P / 10, LR_P / 100], \
        "probe invariant: sentinel holds epochs 1-2, then two decays"
    # the rises that trigger the decays must dwarf cross-arm noise
    assert ref_loss_c[1] - ref_loss_c[0] > 0.5
    assert ref_loss_c[2] - ref_loss_c[1] > 5.0

    # ---- ours: the real Trainer.fit() plateau composition ----
    model_cfg = ModelConfig(
        num_class=C, baseline_type="video", frame_aggregation="avgpool",
        train_segments=S, val_segments=S, fc_dim=FC, feature_dim=D,
        dropout_i=0.0, dropout_v=0.0, use_attn="none")
    da_cfg = DAConfig(use_target="uSv", adv_DA="RevGrad",
                      place_adv=("Y", "Y", "Y"))
    train_cfg = TrainConfig(
        optimizer="SGD", lr=LR_P, lr_adaptive="loss", lr_decay=10.0,
        epochs=EPOCHS_P, batch_size=(B_S, B_T, B_S),
        beta=(1.0, 1.0, 1.0))
    trainer = _RecordingTrainer(
        model_cfg, da_cfg, train_cfg,
        _loader(store_s, B_S), _loader(store_t, B_T), _loader(store_v, B_S),
        path_exp=os.path.join(str(tmp_path), "exp/"),
        use_mesh=False, print_freq=1000, show_freq=1000, eval_freq=1,
        save_model=False, nan_guard=False)
    trainer.rec_loss_c, trainer.rec_lr, trainer.rec_prec1 = [], [], []
    params, batch_stats = import_torch_state_dict(state0)
    tx = _build_tx(train_cfg)
    trainer.state = TrainState(params, batch_stats, tx.init(params),
                               jnp.asarray(0, jnp.int32))
    trainer.fit()

    np.testing.assert_allclose(trainer.rec_lr, ref_lr, rtol=1e-9,
                               err_msg="plateau-decayed lr per epoch")
    # epoch 1 is pre-divergence: tight; later epochs ride an lr-10
    # blow-up where both arms see the SAME decays but f32 chaos spreads
    # the magnitudes — pin loosely
    np.testing.assert_allclose(trainer.rec_loss_c[0], ref_loss_c[0],
                               rtol=1e-3)
    np.testing.assert_allclose(trainer.rec_loss_c, ref_loss_c, rtol=0.15,
                               err_msg="per-epoch avg classification "
                                       "loss under lr=10")
