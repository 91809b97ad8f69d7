"""Import reference PyTorch checkpoints into TA3N-TPU parameters.

Maps the reference `VideoModel` state_dict (models.py:58-325, saved at
main.py:266-274, consumed with the DataParallel `module.` prefix stripped
at test_models.py:89-90) onto this framework's param/batch_stats pytrees,
so published checkpoints evaluate bit-comparably on TPU.

Covered: the shared/target FC stacks, frame/video classifiers, all three
domain heads, single- and multi-scale TRN fusion layers, relation domain
classifiers, general-attention MLP, AdaBN/AutoDIAL BN (affine + running
stats + alpha), the temconv TCL conv, and the LSTM/GRU aggregator (our
RNNAggregator keeps torch's fused-gate layout and names, weights stored
transposed).  The reference's dead parameters (`fc_feature_source`,
`fc_feature_video_source{,_2}` — never used in its forward, SURVEY §2.10)
are accepted and dropped.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

__all__ = ["import_torch_state_dict", "load_torch_checkpoint"]

# reference parameters that exist but never participate in the forward pass
_DEAD_PREFIXES = (
    "fc_feature_source.", "fc_feature_target.",
    "fc_feature_video_source.", "fc_feature_video_source_2.",
    "fc_feature_video_target.", "fc_feature_video_target_2.",
    "bn_trn_S.", "bn_trn_T.",          # built, never called in forward
    "tcl_3_2.", "tcl_5_1.", "tcl_5_2.", "conv_fusion.",
    "bn_2_S.", "bn_2_T.",
    "bn_before_rnn.", "bn_after_rnn.",
    # use_bn!=none constructs these (models.py:198-199,309-312) but the
    # forward only ever BN-aligns at 'shared' and 'temconv_1'
    # (models.py:569-570,662-663) — dropping them keeps dead tensors out
    # of the param tree entirely (torch skips grad=None params; ours
    # would too via the structural-participation decay gate, but tensors
    # that can never participate don't belong in the tree at all)
    "bn_source_S.", "bn_source_T.",
    "bn_source_video_S.", "bn_source_video_T.",
    "bn_source_video_2_S.", "bn_source_video_2_T.",
)

_DENSE_DIRECT = [
    # torch module name -> our param collection name (Dense: weight.T)
    "fc_feature_shared_source", "fc_feature_shared_2_source",
    "fc_feature_shared_3_source", "fc_feature_shared_target",
    "fc_feature_shared_2_target", "fc_feature_shared_3_target",
    "fc_classifier_source", "fc_classifier_target",
    "fc_feature_domain", "fc_classifier_domain",
    "fc_feature_domain_video", "fc_classifier_domain_video",
    "fc_classifier_video_source", "fc_classifier_video_source_2",
    "fc_classifier_video_target", "fc_classifier_video_target_2",
]

_BN_DIRECT = ["bn_shared_S", "bn_shared_T", "bn_1_S", "bn_1_T"]


def strip_module_prefix(state: Dict[str, Any]) -> Dict[str, Any]:
    """Drop the DataParallel 'module.' prefix (test_models.py:89-90)."""
    return {(k[len("module."):] if k.startswith("module.") else k): v
            for k, v in state.items()}


def _to_np(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def import_torch_state_dict(state: Dict[str, Any]
                            ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """state_dict -> (params, batch_stats) pytrees (our naming).

    Unknown keys raise; dead reference parameters are silently dropped.
    """
    state = strip_module_prefix(state)
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    unused = []

    def put_dense(our_name, w, b):
        params[our_name] = {"kernel": _to_np(w).T, "bias": _to_np(b)}

    consumed = set()

    def take(key):
        consumed.add(key)
        return state[key]

    for name in _DENSE_DIRECT:
        wk, bk = f"{name}.weight", f"{name}.bias"
        if wk in state:
            put_dense(name, take(wk), take(bk))

    # bn_1_S/T are LIVE only under use_bn!=none (domainAlign 'temconv_1',
    # models.py:662-663) — a temconv model built without use_bn still
    # constructs them (models.py:232-233), dead; use_bn!=none is
    # detectable by the always-live bn_shared pair
    use_bn_live = "bn_shared_S.weight" in state
    for name in _BN_DIRECT:
        if name in ("bn_1_S", "bn_1_T") and not use_bn_live:
            for suffix in ("weight", "bias", "running_mean", "running_var",
                           "num_batches_tracked"):
                consumed.add(f"{name}.{suffix}")
            continue
        wk = f"{name}.weight"
        if wk in state:
            params[name] = {"scale": _to_np(take(wk)),
                            "bias": _to_np(take(f"{name}.bias"))}
            batch_stats[name] = {
                "mean": _to_np(take(f"{name}.running_mean")),
                "var": _to_np(take(f"{name}.running_var")),
            }
            consumed.add(f"{name}.num_batches_tracked")

    if "alpha" in state:  # AutoDIAL learned scalar (models.py:314-316)
        params["alpha"] = _to_np(take("alpha")).reshape(1)

    # TRN: single-scale Sequential(ReLU, Linear, ReLU) (TRNmodule.py:16-21)
    if "TRN.classifier.1.weight" in state:
        params["TRN"] = {"fc_fusion": {
            "kernel": _to_np(take("TRN.classifier.1.weight")).T,
            "bias": _to_np(take("TRN.classifier.1.bias"))}}
    # TRN: multi-scale fc_fusion_scales.{i}.1 (TRNmodule.py:45-54)
    scale_keys = sorted(
        {k for k in state if k.startswith("TRN.fc_fusion_scales.")})
    if scale_keys:
        trn = params.setdefault("TRN", {})
        n_scales = 1 + max(int(k.split(".")[2]) for k in scale_keys)
        for i in range(n_scales):
            trn[f"w_scale_{i}"] = _to_np(
                take(f"TRN.fc_fusion_scales.{i}.1.weight")).T
            trn[f"b_scale_{i}"] = _to_np(
                take(f"TRN.fc_fusion_scales.{i}.1.bias"))

    # relation domain classifiers: Sequential(Linear, ReLU, Linear)
    # (models.py:287-294)
    rel_keys = {k for k in state
                if k.startswith("relation_domain_classifier_all.")}
    if rel_keys:
        n_rel = 1 + max(int(k.split(".")[1]) for k in rel_keys)
        for i in range(n_rel):
            put_dense(f"relation_domain_fc1_{i}",
                      take(f"relation_domain_classifier_all.{i}.0.weight"),
                      take(f"relation_domain_classifier_all.{i}.0.bias"))
            put_dense(f"relation_domain_fc2_{i}",
                      take(f"relation_domain_classifier_all.{i}.2.weight"),
                      take(f"relation_domain_classifier_all.{i}.2.bias"))

    # general attention MLP (models.py:320-325)
    if "attn_layer.0.weight" in state:
        params["attn_layer"] = {
            "attn_fc1": {"kernel": _to_np(take("attn_layer.0.weight")).T,
                         "bias": _to_np(take("attn_layer.0.bias"))},
            "attn_fc2": {"kernel": _to_np(take("attn_layer.2.weight")).T,
                         "bias": _to_np(take("attn_layer.2.bias"))},
        }

    # temconv TCL: Conv2d(1,1,(k,1)) -> flax Conv kernel [k,1,in,out]
    if "tcl_3_1.conv2d.weight" in state:
        w = _to_np(take("tcl_3_1.conv2d.weight"))  # [out,in,k,1]
        params["tcl_3_1"] = {"Conv_0": {
            "kernel": w.transpose(2, 3, 1, 0),
            "bias": _to_np(take("tcl_3_1.conv2d.bias"))}}

    # RNN aggregator (models.py:202-215): our RNNAggregator keeps torch's
    # own names and fused-gate layout (weights stored transposed, both
    # bias vectors as separate leaves — a training-parity requirement:
    # torch applies the same gradient to b_ih AND b_hh, so a merged bias
    # would receive half the per-step update)
    rnn_keys = sorted(k for k in state if k.startswith("rnn."))
    if rnn_keys:
        rnn_tree: Dict[str, Any] = {}
        for k in rnn_keys:
            name = k[len("rnn."):]          # e.g. weight_ih_l0_reverse
            v = _to_np(take(k))
            rnn_tree[name] = v.T if name.startswith("weight_") else v
        params["rnn"] = rnn_tree

    for k in state:
        if k in consumed:
            continue
        if any(k.startswith(p) for p in _DEAD_PREFIXES):
            unused.append(k)
            continue
        raise KeyError(f"unrecognized reference checkpoint key: {k}")

    return params, batch_stats


def load_torch_checkpoint(path: str
                          ) -> Tuple[Dict[str, Any], Dict[str, Any], Dict]:
    """Load a reference .pth.tar checkpoint file (main.py:764-770) and
    return (params, batch_stats, meta)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt)
    params, batch_stats = import_torch_state_dict(state)
    meta = {k: ckpt.get(k) for k in ("epoch", "arch", "best_prec1", "prec1")
            if isinstance(ckpt, dict) and k in ckpt}
    return params, batch_stats, meta
