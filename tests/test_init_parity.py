"""Init-scale parity vs the ACTUAL reference model.

The reference's init loop (models.py:141-305) applies
`normal_(w, 0, 0.001); constant_(b, 0)` to an EXPLICIT list of Linears;
everything it never touches — the TRN fusion Linears (TRNmodule.py:18,50),
the relation-domain Sequentials (models.py:286-294) and the 'general'
attention MLP (models.py:320-325) — keeps torch's DEFAULT Linear init
(kaiming_uniform(a=√5) + bias U(±1/√fan_in), both ≡ U(±1/√fan_in)).

This distinction is load-bearing: with normal(0.001) on the TRN fusion,
its outputs are ~1e-3-scale, every video-level gradient arrives ~1000×
too small, and training stalls at chance while the reference learns
(found by scripts/ref_ab_experiment.py, round 4; fixed via
layers.torch_default_uniform).

Oracle = the reference's OWN freshly-constructed model: every leaf of
its state_dict (mapped into our layout by the weight importer) is
classified by its empirical init scale, and our fresh init of the same
config must land in the same class with a matching scale.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ta3n_tpu.config import ModelConfig, TrainConfig
from ta3n_tpu.io_utils.torch_import import import_torch_state_dict
from ta3n_tpu.models import VideoModel
from ta3n_tpu.train.step import create_train_state

from tests import ref_harness

S, D, FC, C = 5, 128, 64, 12

ARGV = [
    "--arch", "resnet101", "--num_segments", str(S),
    "--val_segments", str(S), "--add_fc", "1", "--fc_dim", str(FC),
    "--baseline_type", "video", "--frame_aggregation", "trn-m",
    "--dropout_i", "0", "--dropout_v", "0",
    "--use_target", "uSv", "--adv_DA", "RevGrad",
    "--place_adv", "Y", "Y", "Y", "--use_attn", "general",
    "--lr", "0.03", "--optimizer", "SGD", "-b", "8", "8", "8", "-j", "0",
]


def _classify(leaf: np.ndarray) -> str:
    """Bucket a freshly-initialized leaf by its empirical scale."""
    std = float(np.std(leaf))
    if std < 1e-8:
        return "const0" if abs(float(np.mean(leaf))) < 1e-8 else "const"
    if std < 5e-3:
        return "normal001"
    return "torch_default"


def test_init_scale_matches_actual_reference():
    ref_harness.set_feature_dim(D)
    args = ref_harness.make_args(ARGV)
    dp = ref_harness.build_ref_model(args, C)
    ref_params, ref_stats = import_torch_state_dict(
        ref_harness.state_dict_numpy(dp))

    cfg = ModelConfig(num_class=C, baseline_type="video",
                      frame_aggregation="trn-m", train_segments=S,
                      val_segments=S, fc_dim=FC, feature_dim=D,
                      dropout_i=0.0, dropout_v=0.0, use_attn="general")
    state = create_train_state(VideoModel(cfg), jax.random.PRNGKey(0),
                               8, 8, TrainConfig())

    flat_ref = dict(jax.tree_util.tree_flatten_with_path(ref_params)[0])
    flat_ours = jax.tree_util.tree_flatten_with_path(state.params)[0]
    assert {k for k, _ in flat_ours} == set(flat_ref)

    saw = set()
    for path, ours in flat_ours:
        name = jax.tree_util.keystr(path)
        ref = np.asarray(flat_ref[path])
        ours = np.asarray(ours)
        cls = _classify(ref)
        saw.add(cls)
        assert _classify(ours) == cls, \
            f"{name}: ref init class {cls}, ours {_classify(ours)} " \
            f"(ref std {np.std(ref):.2e}, ours {np.std(ours):.2e})"
        if cls == "torch_default" and ours.size >= 32:
            # U(±1/√fan_in): compare std and support bound (std of a
            # tiny leaf — e.g. a 2-wide domain-head bias — is too noisy
            # to ratio-test; the class match above still pins its scale)
            ratio = float(np.std(ours) / np.std(ref))
            assert 0.7 < ratio < 1.4, f"{name}: std ratio {ratio:.3f}"
            bound_ratio = float(np.max(np.abs(ours))
                                / np.max(np.abs(ref)))
            assert 0.6 < bound_ratio < 1.6, \
                f"{name}: bound ratio {bound_ratio:.3f}"
        elif cls == "normal001":
            assert 5e-4 < float(np.std(ours)) < 2e-3, name
    # the config must actually exercise all three classes
    assert saw >= {"torch_default", "normal001", "const0"}, saw


def test_torch_default_layers_are_exactly_the_untouched_ones():
    """The torch-default class must cover exactly the three layer groups
    the reference's init loop never touches — no more, no fewer."""
    ref_harness.set_feature_dim(D)
    args = ref_harness.make_args(ARGV)
    dp = ref_harness.build_ref_model(args, C)
    state = ref_harness.state_dict_numpy(dp)
    default_groups = set()
    for key, v in state.items():
        if not key.endswith(".weight") or np.asarray(v).ndim != 2:
            continue
        if _classify(np.asarray(v)) == "torch_default":
            default_groups.add(key.split(".")[0])
    assert default_groups == {"TRN", "relation_domain_classifier_all",
                              "attn_layer"}, default_groups
