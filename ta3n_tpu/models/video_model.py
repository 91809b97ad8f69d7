"""The TA3N video domain-adaptation model, TPU-native.

Behavioural parity with the reference `VideoModel` (models.py:58-722) under
a different execution design:

  * **One fused stream.** The reference runs every layer twice (source then
    target, models.py:565-698).  Here the two streams are concatenated into
    a single [Bs+Bt (videos), ...] batch for every shared layer, so XLA sees
    one large GEMM per layer instead of two small ones (better MXU tiling);
    the streams are split only where semantics require it (AdaBN routing,
    output packaging).  With `share_params='N'` the per-domain layers are
    computed for all rows and selected per row, keeping one static program.

  * **Static shapes everywhere.** Dummy-row padding / removeDummy
    (main.py:358-372,825-832) is replaced by caller-side masks; the model
    itself is shape-polymorphic only in the batch dimension.

  * **Traced schedule scalars.** `beta` (3,) and `mu` are traced arguments —
    the DANN per-step schedule (main.py:350-352) never retraces.

Output structure: the reference returns lists *reversed* "due to some
multi-gpu issues" (models.py:722); the post-reversal order is the public
contract (`pred_domain = [relation, video, frame]`, consumed by
`--place_adv` indices at main.py:513-517).  We return named tuples in that
same order.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ta3n_tpu.config import ModelConfig
from ta3n_tpu.models.layers import (DenseParams, GeneralAttn,
                                    MaskedBatchNorm, TCL, dense,
                                    trans_attn_weights)
from ta3n_tpu.models.rnn import RNNAggregator
from ta3n_tpu.models.trn import RelationModule, RelationModuleMultiScale
from ta3n_tpu.ops.grl import grad_reverse

__all__ = ["VideoModel", "StreamOutput"]


class StreamOutput(NamedTuple):
    """Per-domain forward outputs (reference 10-tuple halves, models.py:722).

    pred_domain order = (relation, video, frame) — the reference's
    post-reversal order keyed by --place_adv / beta[0..2].
    feat order = the reference's reversed feat_all list.
    """

    attn: jax.Array               # [B, R] (trn) or [B] (others; junk value)
    out: jax.Array                # final logits (video/tsn: [B,C]; frame: [B,S,C])
    out_2: jax.Array              # MCD second-classifier logits (== out if no MCD)
    pred_domain: Tuple[jax.Array, ...]
    feat: Tuple[jax.Array, ...]


class VideoModel(nn.Module):
    cfg: ModelConfig

    def _dtype(self):
        return jnp.dtype(self.cfg.compute_dtype)

    def _dual_dense(self, features, name_s, name_t, x, n_source_rows):
        """Shared layer, or per-domain pair selected per row (share_params=N).

        Parity: the `share_params == 'N'` target variants
        (models.py:174-192,296-305).
        """
        y_s = dense(features, dtype=self._dtype(), name=name_s,
                    quantize=self.cfg.quantize)(x)
        if self.cfg.share_params == "Y":
            return y_s
        y_t = dense(features, dtype=self._dtype(), name=name_t,
                    quantize=self.cfg.quantize)(x)
        is_src = (jnp.arange(x.shape[0]) < n_source_rows)
        return jnp.where(is_src.reshape((-1,) + (1,) * (x.ndim - 1)), y_s, y_t)

    def _domain_align(self, x, bn_name, is_train, batch_s, batch_t,
                      rows_per_video, alpha, mask_s=None, mask_t=None):
        """AdaBN / AutoDIAL dual-BN with cross-domain statistic mixing.

        Functional re-design of reference domainAlign (models.py:490-543):
        instead of dynamically re-ordering rows between the two BNs, each
        row is routed to BN_S or BN_T by a mask; a BN's *statistics* are
        computed over exactly the rows routed to it (an alpha fraction of
        its own domain plus the tail of the other domain), and each row is
        normalized by the stats of the BN it was routed to — the intended
        semantics.  Two reference behaviours are deliberately not kept:
        (1) models.py:532-533 reads `input_source_bn` after overwriting it,
        leaking source rows into the target stream (aliasing bug); (2) the
        learned AutoDIAL alpha is read via `.item()` (models.py:570), so it
        never receives gradient — here alpha trains.
        x: [(batch_s+batch_t)*rows_per_video, F], source rows first.
        """
        alpha_c = jnp.maximum(alpha, 0.5)  # models.py:495
        n_s1 = jnp.round(batch_s * alpha_c)
        n_t1 = jnp.round(batch_t * alpha_c)
        if is_train:
            mixing = jnp.logical_and(batch_s - n_s1 > 0, batch_t - n_t1 > 0)
        else:
            mixing = jnp.asarray(False)
        vid_s_own = jnp.arange(batch_s) < n_s1
        vid_t_own = jnp.arange(batch_t) < n_t1
        route_s_to_S = jnp.where(mixing, vid_s_own, True)
        route_t_to_T = jnp.where(mixing, vid_t_own, True)
        w_S_video = jnp.concatenate([route_s_to_S, ~route_t_to_T])
        w_S = jnp.repeat(w_S_video, rows_per_video).astype(x.dtype)
        w_T = 1.0 - w_S
        if mask_s is not None:
            # batch-validity masks: padded videos contribute to NEITHER
            # BN's statistics (the reference pushes zero dummy rows
            # through its BNs, main.py:358-372 — a documented fix, like
            # the aliasing divergence above: results must equal a run
            # with the smaller true batch)
            valid = jnp.repeat(jnp.concatenate([mask_s, mask_t]),
                               rows_per_video).astype(x.dtype)
            w_S = w_S * valid
            w_T = w_T * valid
        bn_s = MaskedBatchNorm(x.shape[-1], name=f"{bn_name}_S")
        bn_t = MaskedBatchNorm(x.shape[-1], name=f"{bn_name}_T")
        y_s = bn_s(x, stats_weight=w_S, use_running_average=not is_train)
        y_t = bn_t(x, stats_weight=w_T, use_running_average=not is_train)
        return jnp.where(w_S[:, None] > 0, y_s, y_t)

    @nn.compact
    def __call__(self, input_source: jax.Array, input_target: jax.Array,
                 beta: jax.Array, mu, is_train: bool = True,
                 reverse: bool = False,
                 combined_rows: Optional[jax.Array] = None,
                 mask_source: Optional[jax.Array] = None,
                 mask_target: Optional[jax.Array] = None
                 ) -> Tuple[StreamOutput, StreamOutput]:
        """Dual-stream forward (reference forward, models.py:545-722).

        input_source: [Bs, S, D], input_target: [Bt, S, D];
        S = train_segments if is_train else val_segments.
        beta: traced (3,) array = [relation, video, frame] GRL strengths.
        mu: traced scalar, GRL strength of the MCD reverse step.

        combined_rows: optional pre-stacked frame rows
        [(Bs+Bt)*S, D] (source videos first) — the combined-store path
        gathers both domains' rows in ONE device gather already in this
        layout, so the entry concat+reshape is skipped.
        input_source/input_target are then consumed only for their
        static shapes (XLA dead-code-eliminates their values).  Measured
        slower than the default on TPU (BENCH_NOTES "Combined-store
        single-gather"); kept as a tested opt-in.
        """
        cfg = self.cfg
        num_segments = cfg.train_segments if is_train else cfg.val_segments
        bs, bt = input_source.shape[0], input_target.shape[0]
        if input_source.shape[1] != num_segments:
            raise ValueError(
                f"expected {num_segments} segments, got {input_source.shape[1]}")
        b_all = bs + bt
        dtype = self._dtype()

        # AutoDIAL's alpha is a learned scalar; AdaBN keeps it at 1 (no
        # mixing).  models.py:314-316.
        if cfg.use_bn == "AutoDIAL":
            alpha = self.param("alpha", nn.initializers.ones, (1,))[0]
        else:
            alpha = jnp.asarray(1.0)

        # ---- fused two-stream batch: source videos first ----
        if combined_rows is not None:
            f = combined_rows.astype(dtype)
        else:
            x = jnp.concatenate([input_source, input_target], axis=0)
            f = x.reshape(b_all * num_segments, -1).astype(dtype)
        n_src_frames = bs * num_segments

        feat_all = []  # appended in reference order; reversed at the end

        # ---- shared frame-level FC stack (models.py:565-603) ----
        for li in range(cfg.add_fc):
            suffix = "" if li == 0 else f"_{li + 1}"
            f = self._dual_dense(cfg.shared_dim,
                                 f"fc_feature_shared{suffix}_source",
                                 f"fc_feature_shared{suffix}_target",
                                 f, n_src_frames)
            if li == 0 and cfg.use_bn != "none":
                f = self._domain_align(f, "bn_shared", is_train, bs, bt,
                                       num_segments, alpha,
                                       mask_source, mask_target)
            f = nn.relu(f)
            f = nn.Dropout(cfg.dropout_i)(f, deterministic=not is_train)
            feat_all.append(f.reshape(b_all, num_segments, -1))

        # ---- adversarial branch, frame level (models.py:456-462,605-610) ----
        h = grad_reverse(f, beta[2])
        h = dense(cfg.shared_dim, dtype=dtype, name="fc_feature_domain",
                  quantize=cfg.quantize)(h)
        h = nn.relu(h)
        pred_domain_frame = dense(2, dtype=dtype,
                                  name="fc_classifier_domain")(h)

        # ---- optional frame-level attention (models.py:368-377,612-614) ----
        # Note: the reference picks the method from `use_attn` here
        # (models.py:369) and crashes if only use_attn_frame is set; we key
        # off use_attn_frame itself.
        if cfg.use_attn_frame == "TransAttn":
            w = trans_attn_weights(pred_domain_frame.astype(jnp.float32))
            f = (w[:, None].astype(dtype) + 1) * f
        elif cfg.use_attn_frame == "general":
            w = GeneralAttn(cfg.shared_dim, quantize=cfg.quantize,
                            name="attn_layer_frame")(
                f.reshape(b_all, num_segments, -1))
            f = (w.reshape(-1, 1).astype(dtype) + 1) * f

        # ---- frame classifier (models.py:616-621) ----
        pred_fc = self._dual_dense(cfg.num_class, "fc_classifier_source",
                                   "fc_classifier_target", f, n_src_frames)
        if cfg.baseline_type == "frame":
            feat_all.append(pred_fc.reshape(b_all, num_segments, -1))

        # ---- aggregation: frames -> video (models.py:623-672) ----
        feat_seg = f.reshape(b_all, num_segments, -1)
        pred_domain_frame_3d = pred_domain_frame.reshape(
            b_all, num_segments, 2)
        pred_domain_relation = None
        attn = None

        if cfg.frame_aggregation in ("avgpool", "rnn"):
            if cfg.frame_aggregation == "avgpool":
                fv = feat_seg
                if cfg.use_attn == "TransAttn":  # models.py:427-430
                    w = trans_attn_weights(
                        pred_domain_frame_3d.astype(jnp.float32))
                    fv = (w[..., None].astype(dtype) + 1) * fv
                feat_video = jnp.mean(fv, axis=1)
            else:
                feat_video = RNNAggregator(cfg, name="rnn")(
                    feat_seg, num_segments)
            attn = feat_video[:, 0]  # junk, parity with models.py:628-629

        elif cfg.frame_aggregation in ("trn", "trn-m"):
            if cfg.frame_aggregation == "trn":
                rel = RelationModule(cfg.shared_dim, cfg.num_bottleneck,
                                     num_segments, dtype=dtype,
                                     quantize=cfg.quantize,
                                     name="TRN")(feat_seg)
            else:
                rel = RelationModuleMultiScale(cfg.shared_dim,
                                               cfg.num_bottleneck,
                                               num_segments, dtype=dtype,
                                               quantize=cfg.quantize,
                                               name="TRN")(
                    feat_seg, infer=not is_train)
            num_relation = rel.shape[1]

            # relation-level adversarial heads (models.py:472-488): one
            # 2-layer MLP per relation scale, all on GRL(beta[0]).  The R
            # per-scale heads run as TWO batched GEMMs instead of 2R small
            # ones (op-count-bound step, BENCH_NOTES.md); per-head params
            # keep the reference checkpoint layout and init stream.
            rel_rev = grad_reverse(rel, beta[0])
            in_dim = rel_rev.shape[-1]
            # torch DEFAULT init: the reference builds these Sequentials
            # outside its normal_(0.001) loop (models.py:286-294)
            w1, b1 = zip(*[DenseParams(cfg.aggregated_dim,
                                       init="torch_default",
                                       name=f"relation_domain_fc1_{i}")(
                               in_dim) for i in range(num_relation)])
            w2, b2 = zip(*[DenseParams(2, init="torch_default",
                                       name=f"relation_domain_fc2_{i}")(
                               cfg.aggregated_dim)
                           for i in range(num_relation)])
            from ta3n_tpu.models.layers import (_QUANT_MIN_DIM,
                                                int8_batched_matmul)
            if (cfg.quantize == "int8" and in_dim >= _QUANT_MIN_DIM
                    and cfg.aggregated_dim >= _QUANT_MIN_DIM):
                hi = nn.relu(int8_batched_matmul(rel_rev, jnp.stack(w1))
                             + jnp.stack(b1).astype(jnp.float32)[None])
            else:
                hi = nn.relu(jnp.einsum("bri,rio->bro", rel_rev.astype(dtype),
                                        jnp.stack(w1).astype(dtype))
                             + jnp.stack(b1).astype(dtype)[None])
            pred_domain_relation = (
                jnp.einsum("brh,rho->bro", hi,
                           jnp.stack(w2).astype(dtype))
                + jnp.stack(b2).astype(dtype)[None])  # [B, R, 2]

            # transferable attention over relations (models.py:379-388,643-648)
            if cfg.use_attn == "TransAttn":
                w = trans_attn_weights(
                    pred_domain_relation.astype(jnp.float32))  # [B, R]
                rel = (w[..., None].astype(dtype) + 1) * rel
                attn = w
            elif cfg.use_attn == "general":
                w = GeneralAttn(cfg.aggregated_dim, quantize=cfg.quantize,
                                name="attn_layer")(rel)
                rel = (w.astype(dtype) + 1) * rel
                attn = w[:, :, 0]
            else:
                attn = rel[:, :, 0]

            feat_video = jnp.sum(rel, axis=1)  # models.py:651

        elif cfg.frame_aggregation == "temconv":
            # 1st TCL + optional domainAlign + relu + avg (models.py:654-672)
            xc = feat_seg[..., None]  # [B, S, D, 1]
            xc = TCL(3, name="tcl_3_1")(xc)
            xc_rows = xc[..., 0].reshape(b_all * num_segments, -1)
            if cfg.use_bn != "none":
                xc_rows = self._domain_align(xc_rows, "bn_1", is_train, bs,
                                             bt, num_segments, alpha,
                                             mask_source, mask_target)
            xc_rows = nn.relu(xc_rows)
            feat_video = jnp.mean(
                xc_rows.reshape(b_all, num_segments, -1), axis=1)
            attn = feat_video[:, 0]
        else:
            raise ValueError(
                f"unsupported frame_aggregation {cfg.frame_aggregation}")

        if cfg.baseline_type == "video":
            feat_all.append(feat_video)

        # ---- video-level classifier (models.py:678-691) ----
        feat_video = nn.Dropout(cfg.dropout_v)(feat_video,
                                               deterministic=not is_train)
        if reverse:
            feat_video = grad_reverse(feat_video, mu)  # MCD step-2

        pred_video = self._dual_dense(cfg.num_class,
                                      "fc_classifier_video_source",
                                      "fc_classifier_video_target",
                                      feat_video, bs)
        if cfg.baseline_type == "video":
            feat_all.append(pred_video)

        # ---- adversarial branch, video level (models.py:464-470,693-698) ----
        hv = grad_reverse(feat_video, beta[1])
        hv = dense(cfg.aggregated_dim, dtype=dtype,
                   name="fc_feature_domain_video",
                   quantize=cfg.quantize)(hv)
        hv = nn.relu(hv)
        pred_domain_video = dense(2, dtype=dtype,
                                  name="fc_classifier_domain_video")(hv)

        if pred_domain_relation is None:
            # non-TRN: the relation slot carries a copy of the video-level
            # logits (models.py:705-707).
            pred_domain_relation = pred_domain_video

        # ---- final output (models.py:437-454,709-720) ----
        def final_output(pred_frame, pred_vid):
            if cfg.baseline_type == "video":
                out = pred_vid  # [B, C]
            else:
                # Divergence: the reference keeps frame logits flat
                # [B*S, C]; we keep the video axis so per-video masking and
                # metrics work (the reference's removeDummy slices this
                # tensor inconsistently — SURVEY §2.10 spirit).
                frame3d = pred_frame.reshape(b_all, num_segments, -1)
                out = jnp.mean(frame3d, axis=1) if cfg.baseline_type == "tsn" \
                    else frame3d
            if not cfg.before_softmax:
                out = jax.nn.softmax(out, axis=-1)
            return out

        output = final_output(pred_fc, pred_video)
        output_2 = output
        if cfg.ens_DA == "MCD":
            pred_video_2 = self._dual_dense(cfg.num_class,
                                            "fc_classifier_video_source_2",
                                            "fc_classifier_video_target_2",
                                            feat_video, bs)
            output_2 = final_output(pred_fc, pred_video_2)

        # ---- split the fused batch back into the two streams ----
        def split(arr):
            return arr[:bs], arr[bs:]

        pred_domain = (pred_domain_relation, pred_domain_video,
                       pred_domain_frame_3d)
        pd_s, pd_t = zip(*(split(p) for p in pred_domain))
        feat_rev = tuple(reversed(feat_all))
        ft_s, ft_t = zip(*(split(ftr) for ftr in feat_rev))
        attn_s, attn_t = split(attn)
        out_s, out_t = split(output)
        out2_s, out2_t = split(output_2)

        return (StreamOutput(attn_s, out_s, out2_s, tuple(pd_s), tuple(ft_s)),
                StreamOutput(attn_t, out_t, out2_t, tuple(pd_t), tuple(ft_t)))
