"""Reference-checkpoint import + numerical eval parity.

Builds a PyTorch mirror of the reference forward math (video baseline,
trn-m, TransAttn — the published TA3N config) with reference-style
state_dict naming, imports it through `import_torch_state_dict`, and
checks our TPU model reproduces the torch logits.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ta3n_tpu.config import ModelConfig
from ta3n_tpu.io_utils.torch_import import (import_torch_state_dict,
                                            strip_module_prefix)
from ta3n_tpu.models import VideoModel
from ta3n_tpu.ops.relation import build_relation_plan

B, S, D, FC, H, C = 4, 5, 24, 16, 256, 6


def build_torch_state(seed=0):
    torch.manual_seed(seed)
    mods = {
        "fc_feature_shared_source": nn.Linear(D, FC),
        "fc_feature_domain": nn.Linear(FC, FC),
        "fc_classifier_domain": nn.Linear(FC, 2),
        "fc_classifier_source": nn.Linear(FC, C),
        "fc_feature_domain_video": nn.Linear(H, H),
        "fc_classifier_domain_video": nn.Linear(H, 2),
        "fc_classifier_video_source": nn.Linear(H, C),
    }
    plan = build_relation_plan(S)
    for i, k in enumerate(plan.scales):
        mods[f"TRN.fc_fusion_scales.{i}.1"] = nn.Linear(k * FC, H)
    for i in range(S - 1):
        mods[f"relation_domain_classifier_all.{i}.0"] = nn.Linear(H, H)
        mods[f"relation_domain_classifier_all.{i}.2"] = nn.Linear(H, 2)
    state = {}
    for name, m in mods.items():
        state[f"{name}.weight"] = m.weight.detach().clone()
        state[f"{name}.bias"] = m.bias.detach().clone()
    return mods, state


def torch_forward(mods, x):
    """Eval-mode mirror of the reference forward (models.py:545-722):
    video baseline, trn-m, TransAttn, beta=0 (GRL identity forward)."""
    plan = build_relation_plan(S)
    b = x.shape[0]
    f = torch.relu(mods["fc_feature_shared_source"](x.reshape(-1, D)))
    pred_dom_frame = mods["fc_classifier_domain"](
        torch.relu(mods["fc_feature_domain"](f)))

    feat_seg = f.reshape(b, S, FC)
    rel = []
    for i, (k, subsets) in enumerate(zip(plan.scales, plan.subsets)):
        acc = 0
        for subset in subsets:
            g = feat_seg[:, list(subset), :].reshape(b, k * FC)
            acc = acc + torch.relu(
                mods[f"TRN.fc_fusion_scales.{i}.1"](torch.relu(g)))
        rel.append(acc)
    rel = torch.stack(rel, dim=1)  # [B, S-1, H]

    dom_rel = []
    for i in range(S - 1):
        hh = torch.relu(
            mods[f"relation_domain_classifier_all.{i}.0"](rel[:, i, :]))
        dom_rel.append(mods[f"relation_domain_classifier_all.{i}.2"](hh))
    dom_rel = torch.stack(dom_rel, dim=1)  # [B, S-1, 2]

    # TransAttn (models.py:351-357,379-388)
    ent = torch.sum(-F.softmax(dom_rel, dim=-1)
                    * F.log_softmax(dom_rel, dim=-1), dim=-1)
    w = 1 - ent
    rel = (w.unsqueeze(-1) + 1) * rel
    feat_video = rel.sum(dim=1)

    pred_video = mods["fc_classifier_video_source"](feat_video)
    pred_dom_video = mods["fc_classifier_domain_video"](
        torch.relu(mods["fc_feature_domain_video"](feat_video)))
    return (pred_video, dom_rel, pred_dom_video,
            pred_dom_frame.reshape(b, S, 2), w)


@pytest.fixture(scope="module")
def setup():
    mods, state = build_torch_state()
    cfg = ModelConfig(num_class=C, baseline_type="video",
                      frame_aggregation="trn-m", train_segments=S,
                      val_segments=S, fc_dim=FC, feature_dim=D,
                      use_attn="TransAttn", dropout_i=0.5, dropout_v=0.5)
    model = VideoModel(cfg)
    params, batch_stats = import_torch_state_dict(state)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, S, D)).astype(np.float32)
    return mods, state, model, params, x


def test_eval_logits_match_torch(setup):
    mods, state, model, params, x = setup
    want, want_dom_rel, want_dom_vid, want_dom_frame, want_attn = \
        torch_forward(mods, torch.from_numpy(x))
    out_s, out_t = model.apply({"params": params}, jnp.asarray(x),
                               jnp.asarray(x), jnp.zeros(3),
                               jnp.asarray(0.0), False, False)
    np.testing.assert_allclose(np.asarray(out_s.out),
                               want.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_s.pred_domain[0]),
                               want_dom_rel.detach().numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_s.pred_domain[1]),
                               want_dom_vid.detach().numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_s.pred_domain[2]),
                               want_dom_frame.detach().numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_s.attn),
                               want_attn.detach().numpy(), rtol=1e-4,
                               atol=1e-5)


def test_module_prefix_stripped(setup):
    mods, state, model, params, x = setup
    wrapped = {f"module.{k}": v for k, v in state.items()}
    params2, _ = import_torch_state_dict(wrapped)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(params2)
    for u, v in zip(a, b):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))


def test_dead_params_dropped():
    _, state = build_torch_state()
    state["fc_feature_source.weight"] = torch.zeros(FC, FC)
    state["fc_feature_source.bias"] = torch.zeros(FC)
    state["fc_feature_video_source.weight"] = torch.zeros(H, H)
    state["fc_feature_video_source.bias"] = torch.zeros(H)
    params, _ = import_torch_state_dict(state)
    assert "fc_feature_source" not in params
    assert "fc_feature_video_source" not in params


def test_unknown_key_raises():
    _, state = build_torch_state()
    state["mystery.weight"] = torch.zeros(3, 3)
    with pytest.raises(KeyError):
        import_torch_state_dict(state)


def test_bn_import_roundtrip():
    state = {
        "bn_shared_S.weight": torch.ones(FC) * 2,
        "bn_shared_S.bias": torch.zeros(FC),
        "bn_shared_S.running_mean": torch.ones(FC),
        "bn_shared_S.running_var": torch.ones(FC) * 3,
        "bn_shared_S.num_batches_tracked": torch.tensor(5),
    }
    params, stats = import_torch_state_dict(state)
    np.testing.assert_array_equal(params["bn_shared_S"]["scale"],
                                  2 * np.ones(FC))
    np.testing.assert_array_equal(stats["bn_shared_S"]["var"],
                                  3 * np.ones(FC))
