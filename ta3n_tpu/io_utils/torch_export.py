"""Export TA3N-TPU parameters as a reference-format PyTorch checkpoint.

The inverse of `torch_import.py`: produces a state_dict with the
reference `VideoModel`'s exact key layout (models.py:58-325) wrapped in
the reference's checkpoint dict ({epoch, arch, state_dict, best_prec1,
prec1} with the DataParallel ``module.`` prefix, main.py:764-770), so a
model trained here can be evaluated or fine-tuned with the reference's
own torch tooling (test_models.py loads with strict
load_state_dict, test_models.py:89-90).

The reference's DEAD parameters (`fc_feature_source`,
`fc_feature_video_source{,_2}`, target variants under share_params=N —
never used in its forward, SURVEY §2.10) are synthesized with zeros in
the shapes the reference constructs, because its strict load requires
every key.  Conditional modules we don't hold parameters for (temconv
extras, RNN BNs, AdaBN sites) simply stay absent — they only exist in
reference configs whose live parameters we'd hold too.

Round-trip contract (test-enforced):
`import_torch_state_dict(export_state_dict(params, stats))` reproduces
(params, stats) exactly, including the RNN fused-gate bias convention
(our merged cell biases export as b_ih with b_hh zeroed — torch adds
them, so the math is identical).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from ta3n_tpu.io_utils.torch_import import _BN_DIRECT, _DENSE_DIRECT

__all__ = ["export_state_dict", "save_torch_checkpoint"]


def _w(kernel) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(kernel).T)


def export_state_dict(params: Dict[str, Any],
                      batch_stats: Optional[Dict[str, Any]] = None
                      ) -> Dict[str, np.ndarray]:
    batch_stats = batch_stats or {}
    out: Dict[str, np.ndarray] = {}
    consumed = set()

    for name in _DENSE_DIRECT:
        if name in params:
            out[f"{name}.weight"] = _w(params[name]["kernel"])
            out[f"{name}.bias"] = np.asarray(params[name]["bias"])
            consumed.add(name)

    for name in _BN_DIRECT:
        if name in params:
            out[f"{name}.weight"] = np.asarray(params[name]["scale"])
            out[f"{name}.bias"] = np.asarray(params[name]["bias"])
            st = batch_stats.get(name, {})
            out[f"{name}.running_mean"] = np.asarray(
                st.get("mean", np.zeros_like(params[name]["scale"])))
            out[f"{name}.running_var"] = np.asarray(
                st.get("var", np.ones_like(params[name]["scale"])))
            out[f"{name}.num_batches_tracked"] = np.asarray(0, np.int64)
            consumed.add(name)

    if "alpha" in params:
        out["alpha"] = np.asarray(params["alpha"]).reshape(())
        consumed.add("alpha")

    trn = params.get("TRN", {})
    trn_consumed = set()
    if "fc_fusion" in trn:  # single-scale (TRNmodule.py:16-21)
        out["TRN.classifier.1.weight"] = _w(trn["fc_fusion"]["kernel"])
        out["TRN.classifier.1.bias"] = np.asarray(trn["fc_fusion"]["bias"])
        trn_consumed.add("fc_fusion")
    i = 0
    while f"w_scale_{i}" in trn:  # multi-scale (TRNmodule.py:45-54)
        out[f"TRN.fc_fusion_scales.{i}.1.weight"] = _w(trn[f"w_scale_{i}"])
        out[f"TRN.fc_fusion_scales.{i}.1.bias"] = np.asarray(
            trn[f"b_scale_{i}"])
        trn_consumed.update((f"w_scale_{i}", f"b_scale_{i}"))
        i += 1
    if trn:
        extra = set(trn) - trn_consumed
        if extra:  # don't silently drop an unmapped TRN tensor
            raise KeyError(f"no reference mapping for TRN params {extra}")
        consumed.add("TRN")

    i = 0
    while f"relation_domain_fc1_{i}" in params:  # models.py:287-294
        for our, slot in ((f"relation_domain_fc1_{i}", 0),
                          (f"relation_domain_fc2_{i}", 2)):
            out[f"relation_domain_classifier_all.{i}.{slot}.weight"] = _w(
                params[our]["kernel"])
            out[f"relation_domain_classifier_all.{i}.{slot}.bias"] = \
                np.asarray(params[our]["bias"])
            consumed.add(our)
        i += 1

    if "attn_layer" in params:  # models.py:320-325
        al = params["attn_layer"]
        out["attn_layer.0.weight"] = _w(al["attn_fc1"]["kernel"])
        out["attn_layer.0.bias"] = np.asarray(al["attn_fc1"]["bias"])
        out["attn_layer.2.weight"] = _w(al["attn_fc2"]["kernel"])
        out["attn_layer.2.bias"] = np.asarray(al["attn_fc2"]["bias"])
        consumed.add("attn_layer")

    if "tcl_3_1" in params:  # flax [k,1,in,out] -> torch [out,in,k,1]
        conv = params["tcl_3_1"]["Conv_0"]
        out["tcl_3_1.conv2d.weight"] = np.ascontiguousarray(
            np.asarray(conv["kernel"]).transpose(3, 2, 0, 1))
        out["tcl_3_1.conv2d.bias"] = np.asarray(conv["bias"])
        consumed.add("tcl_3_1")

    if "rnn" in params:
        _export_rnn(params["rnn"], out)
        consumed.add("rnn")

    for k in params:
        if k not in consumed:
            raise KeyError(f"no reference mapping for param collection "
                           f"'{k}'")

    _synthesize_dead(out)
    return out


def _export_rnn(rnn: Dict[str, Any], out: Dict[str, np.ndarray]) -> None:
    """Our RNNAggregator params ARE torch's names/layout (weights stored
    transposed, both bias leaves kept) — export is a transpose+rename."""
    for name, v in rnn.items():
        v = np.asarray(v)
        out[f"rnn.{name}"] = (np.ascontiguousarray(v.T)
                              if name.startswith("weight_") else v)


def _synthesize_dead(out: Dict[str, np.ndarray]) -> None:
    """Reference-constructed but forward-dead modules (SURVEY §2.10):
    strict load_state_dict needs every key (verified against the ACTUAL
    /root/reference/test_models.py:85-90 loader in
    tests/test_ref_checkpoint_interop.py); shapes mirror live layers.
    Dead BNs carry fresh-init values (the reference never forwards
    them, so a trained reference checkpoint holds init there too);
    dead convs/Linears are zeroed (reference holds unused random init —
    values are irrelevant, only key/shape presence matters)."""
    def dead_like(dead_name: str, like_weight: str):
        w = out[like_weight]
        out[f"{dead_name}.weight"] = np.zeros_like(w)
        out[f"{dead_name}.bias"] = np.zeros(w.shape[0], w.dtype)

    def dead_bn(name: str, dim: int):
        out[f"{name}.weight"] = np.ones(dim, np.float32)
        out[f"{name}.bias"] = np.zeros(dim, np.float32)
        out[f"{name}.running_mean"] = np.zeros(dim, np.float32)
        out[f"{name}.running_var"] = np.ones(dim, np.float32)
        out[f"{name}.num_batches_tracked"] = np.asarray(0, np.int64)

    def dead_conv(name: str, c_out: int, c_in: int, k: int):
        out[f"{name}.weight"] = np.zeros((c_out, c_in, k, 1), np.float32)
        out[f"{name}.bias"] = np.zeros(c_out, np.float32)

    # trn/trn-m: bn_trn pair sized to the bottleneck (models.py:217-226)
    trn_bias = out.get("TRN.classifier.1.bias",
                       out.get("TRN.fc_fusion_scales.0.1.bias"))
    if trn_bias is not None:
        for s in ("S", "T"):
            dead_bn(f"bn_trn_{s}", trn_bias.shape[0])

    # rnn: BatchNorm2d(1) pair (models.py:214-215)
    if "rnn.weight_ih_l0" in out:
        dead_bn("bn_before_rnn", 1)
        dead_bn("bn_after_rnn", 1)

    # temconv: 2nd-stage TCLs + fusion + bn_2 pair (models.py:230-243);
    # bn_1 pair is live only under use_bn (already exported then)
    if "tcl_3_1.conv2d.weight" in out:
        frame_dim = out["fc_classifier_source.weight"].shape[1]
        dead_conv("tcl_5_1.conv2d", 1, 1, 5)
        dead_conv("tcl_3_2.conv2d", 1, 1, 3)
        dead_conv("tcl_5_2.conv2d", 2, 2, 5)
        out["conv_fusion.0.weight"] = np.zeros((1, 2, 1, 1), np.float32)
        out["conv_fusion.0.bias"] = np.zeros(1, np.float32)
        for s in ("S", "T"):
            dead_bn(f"bn_2_{s}", frame_dim)
            if f"bn_1_{s}.weight" not in out:
                dead_bn(f"bn_1_{s}", frame_dim)

    # use_bn!=none: dead frame/video BN pairs (models.py:198-199,309-312)
    if "bn_shared_S.weight" in out:
        shared_dim = out["bn_shared_S.weight"].shape[0]
        video_dim = out["fc_classifier_video_source.weight"].shape[1]
        for s in ("S", "T"):
            dead_bn(f"bn_source_{s}", shared_dim)
            dead_bn(f"bn_source_video_{s}", video_dim)
            dead_bn(f"bn_source_video_2_{s}", video_dim)

    share_n = "fc_classifier_target.weight" in out
    if "fc_feature_domain.weight" in out:
        dead_like("fc_feature_source", "fc_feature_domain.weight")
        if share_n:
            dead_like("fc_feature_target", "fc_feature_domain.weight")
    if "fc_feature_domain_video.weight" in out:
        w = out["fc_feature_domain_video.weight"]
        dead_like("fc_feature_video_source", "fc_feature_domain_video.weight")
        sq = np.zeros((w.shape[0], w.shape[0]), w.dtype)
        out["fc_feature_video_source_2.weight"] = sq
        out["fc_feature_video_source_2.bias"] = np.zeros(w.shape[0], w.dtype)
        if share_n:
            dead_like("fc_feature_video_target",
                      "fc_feature_domain_video.weight")
            out["fc_feature_video_target_2.weight"] = sq.copy()
            out["fc_feature_video_target_2.bias"] = np.zeros(w.shape[0],
                                                             w.dtype)


def save_torch_checkpoint(path: str, params: Dict[str, Any],
                          batch_stats: Optional[Dict[str, Any]] = None,
                          epoch: int = 0, arch: str = "resnet101",
                          best_prec1: float = 0.0, prec1: float = 0.0,
                          module_prefix: bool = True) -> None:
    """Write a reference-format .pth.tar (main.py:764-770).  The
    reference strips a DataParallel ``module.`` prefix at load
    (test_models.py:89-90), so one is added by default."""
    import torch
    sd = export_state_dict(params, batch_stats)
    prefix = "module." if module_prefix else ""
    tensors = {prefix + k: torch.from_numpy(
        np.array(v, copy=True))  # copy: jax arrays are non-writable
               for k, v in sd.items()}
    torch.save({"epoch": epoch, "arch": arch, "state_dict": tensors,
                "best_prec1": best_prec1, "prec1": prec1}, path)
