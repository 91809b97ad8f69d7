"""In-process harness for running the ACTUAL reference code
(/root/reference: main.py / models.py / test_models.py) as the
correctness oracle — not a hand-built mirror.

The reference is CUDA-hardwired and probes torchvision for the feature
dim (models.py:119-126), so we monkeypatch torch the same way
scripts/measure_reference_baseline.py does (nothing under
/root/reference is modified):

  * torchvision stub whose resnet*/c3d probe reports a configurable
    ``fc.in_features`` (set_feature_dim) — models.py:125-126 reads
    nothing else from the probe;
  * Tensor.cuda / Module.cuda -> no-op, torch.cuda.device_count -> 1;
  * torch.nn.DataParallel -> passthrough wrapper exposing .module
    (main.py:79's single-replica CPU analogue).

`load_reference()` then imports the reference's own modules (models,
loss, opts, dataset, main) off /root/reference, and the helpers below
call the reference's REAL `train()` (main.py:309) / `validate()`
(main.py:669) with controlled in-memory batch lists, capturing exact
per-step losses by intercepting `Tensor.backward`.
"""

from __future__ import annotations

import io
import sys
import types

REFERENCE = "/root/reference"

# mutable probe dim, read lazily by the torchvision stub so each test
# can size the reference model to its synthetic features
_PROBE = {"feature_dim": 2048}


def set_feature_dim(dim: int) -> None:
    _PROBE["feature_dim"] = int(dim)


def patch_torch() -> None:
    """CPU-ify torch for the reference code (idempotent)."""
    import torch

    if getattr(torch, "_ta3n_ref_patched", False):
        return

    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")

    class _FC:
        @property
        def in_features(self):
            return _PROBE["feature_dim"]

    class _Probe:
        fc = _FC()

    def _factory(*a, **k):
        return _Probe()

    for name in ("resnet101", "resnet50", "resnet152", "resnet34",
                 "resnet18", "alexnet", "vgg16"):
        setattr(tvm, name, _factory)
    tv.models = tvm
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tvm

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.manual_seed_all = lambda *a, **k: None
    torch.cuda.device_count = lambda: 1
    torch.cuda.LongTensor = torch.LongTensor

    class _PassthroughDP(torch.nn.Module):
        """Single-replica stand-in for DataParallel (main.py:79);
        state_dict keys keep the 'module.' prefix like the real one."""

        def __init__(self, module, device_ids=None, **kwargs):
            super().__init__()
            self.module = module

        def forward(self, *args, **kwargs):
            return self.module(*args, **kwargs)

    torch.nn.DataParallel = _PassthroughDP

    # torch-0.4-era shim: models.py:14 relies on `torch` leaking from
    # `from torch.nn.init import *`
    import torch.nn.init as _init
    if hasattr(_init, "__all__") and "torch" not in _init.__all__:
        _init.__all__ = list(_init.__all__) + ["torch"]

    # torch-0.4-era shim: main.py:820 .view(-1) on non-contiguous
    _orig_view = torch.Tensor.view

    def _lenient_view(self, *shape):
        try:
            return _orig_view(self, *shape)
        except RuntimeError:
            return self.reshape(*shape)

    torch.Tensor.view = _lenient_view
    torch._ta3n_ref_patched = True


_NS = None


def load_reference():
    """Import the reference's modules once per process (patched torch)."""
    global _NS
    if _NS is None:
        patch_torch()
        if REFERENCE not in sys.path:
            sys.path.insert(0, REFERENCE)
        import importlib
        ns = types.SimpleNamespace()
        ns.models = importlib.import_module("models")     # models.py
        ns.loss = importlib.import_module("loss")         # loss.py
        ns.opts = importlib.import_module("opts")         # opts.py
        ns.dataset = importlib.import_module("dataset")   # dataset.py
        ns.main = importlib.import_module("main")         # main.py
        _NS = ns
    return _NS


def make_args(argv_tail):
    """Parse a reference flag list through the reference's own opts.py
    parser (5 dummy positionals — train()/validate() never read them)."""
    ns = load_reference()
    argv = ["class.txt", "RGB", "src.txt", "tgt.txt", "val.txt"]
    return ns.opts.parser.parse_args(argv + list(argv_tail))


def build_ref_model(args, num_class: int):
    """Construct the reference VideoModel exactly as main.py:69-79 does
    (DataParallel-wrapped; .module for the raw model)."""
    import torch
    ns = load_reference()
    model = ns.models.VideoModel(
        num_class, args.baseline_type, args.frame_aggregation,
        args.modality,
        train_segments=args.num_segments, val_segments=args.val_segments,
        base_model=args.arch, path_pretrained=args.pretrained,
        add_fc=args.add_fc, fc_dim=args.fc_dim,
        dropout_i=args.dropout_i, dropout_v=args.dropout_v,
        partial_bn=not args.no_partialbn,
        use_bn=args.use_bn if args.use_target != 'none' else 'none',
        ens_DA=args.ens_DA if args.use_target != 'none' else 'none',
        n_rnn=args.n_rnn, rnn_cell=args.rnn_cell,
        n_directions=args.n_directions, n_ts=args.n_ts,
        use_attn=args.use_attn, n_attn=args.n_attn,
        use_attn_frame=args.use_attn_frame,
        verbose=args.verbose, share_params=args.share_params)
    return torch.nn.DataParallel(model, args.gpus).cuda()


def build_criteria(args, num_class: int, class_freq=None, n_source=None,
                   n_target=None):
    """criterion / criterion_domain as main.py:155-167,205-210 build
    them.  ``class_freq`` (per-class frequency over the source stream)
    and ``n_source``/``n_target`` (dataset sizes) stand in for the list
    files main.py:156-158 reads; the weight formulas are the reference's
    own (main.py:163-167)."""
    import torch
    w_cls = torch.ones(num_class)
    w_dom = torch.Tensor([1.0, 1.0])
    if args.weighted_class_loss == 'Y':
        w_cls = 1 / torch.Tensor(class_freq)          # main.py:163-164
    if args.weighted_class_loss_DA == 'Y':
        w_dom = torch.Tensor([1.0 / n_source,          # main.py:166-167
                              1.0 / n_target])
    return (torch.nn.CrossEntropyLoss(weight=w_cls),
            torch.nn.CrossEntropyLoss(weight=w_dom))


def build_optimizer(args, dp_model):
    import torch
    if args.optimizer == 'SGD':
        return torch.optim.SGD(dp_model.parameters(), args.lr,
                               momentum=args.momentum,
                               weight_decay=args.weight_decay,
                               nesterov=True)
    return torch.optim.Adam(dp_model.parameters(), args.lr,
                            weight_decay=args.weight_decay)


def ref_train(args, dp_model, num_class, batches_source, batches_target,
              optimizer=None, alpha=0.0, epoch=1, class_freq=None,
              n_source=None, n_target=None):
    """Run the reference's ACTUAL train() (main.py:309-667) for one
    pass over the given batch lists.

    Returns (per_step_total_losses, loss_c_avg).  Per-step losses are
    the exact scalars train() calls .backward() on (main.py:577),
    captured by intercepting Tensor.backward.
    """
    import torch
    ns = load_reference()
    ns.main.args = args
    ns.main.gpu_count = 1
    criterion, criterion_domain = build_criteria(
        args, num_class, class_freq=class_freq, n_source=n_source,
        n_target=n_target)
    if optimizer is None:
        optimizer = build_optimizer(args, dp_model)

    losses = []
    orig_backward = torch.Tensor.backward

    def recording_backward(self, *a, **k):
        losses.append(float(self.detach()))
        return orig_backward(self, *a, **k)

    torch.Tensor.backward = recording_backward
    try:
        log = io.StringIO()
        loss_c, _, _ = ns.main.train(
            num_class, batches_source, batches_target, dp_model,
            criterion, criterion_domain, optimizer, epoch, log, log,
            alpha, list(args.beta), args.gamma, args.mu)
    finally:
        torch.Tensor.backward = orig_backward
    return losses, loss_c


def ref_validate(args, dp_model, num_class, val_batches, epoch=1,
                 class_freq=None):
    """Run the reference's ACTUAL validate() (main.py:669-761); returns
    its top-1 average (percent)."""
    import torch
    ns = load_reference()
    ns.main.args = args
    ns.main.gpu_count = 1
    # validate() consumes only `criterion`; pass dummy domain counts so
    # build_criteria's weighted_class_loss_DA branch stays constructible
    criterion, _ = build_criteria(args, num_class, class_freq=class_freq,
                                  n_source=1, n_target=1)
    log = io.StringIO()
    return ns.main.validate(val_batches, dp_model, criterion, num_class,
                            epoch, log)


def state_dict_numpy(dp_model):
    """module.-stripped state_dict as numpy (for our torch importer)."""
    return {k: v.detach().cpu().numpy().copy()
            for k, v in dp_model.module.state_dict().items()}


def make_batches(rng, n_batches, batch, segments, dim, num_class):
    """In-memory (data, label) float32/int64 torch batch list — the
    loader contract train()/validate() consume (main.py:348,686)."""
    import torch
    out = []
    for _ in range(n_batches):
        x = rng.normal(size=(batch, segments, dim)).astype("float32")
        y = rng.integers(0, num_class, size=batch)
        out.append((torch.from_numpy(x),
                    torch.from_numpy(y.astype("int64"))))
    return out
