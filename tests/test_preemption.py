"""Preemption-safe checkpointing: SIGTERM mid-run (pod preemption,
scheduler kill) lands in Trainer.fit's emergency-checkpoint path and the
saved state resumes exactly from the last completed epoch.  The
reference has no failure handling at all (SURVEY §5.3): a killed
main.py run loses everything since the last eval-epoch save."""

import os
import signal
import threading

import pytest

from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
from ta3n_tpu.data import TSNLoader
from ta3n_tpu.data.synthetic import make_domain_pair
from ta3n_tpu.train.loop import Trainer, _sigterm_as_interrupt

SEG, FDIM = 3, 16


def _trainer(tmp_path, epochs: int = 6):
    src, tgt, val = make_domain_pair(num_source=16, num_target=12,
                                     num_val=8, num_class=3,
                                     feature_dim=FDIM, seed=0)
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="avgpool", train_segments=SEG,
                      val_segments=SEG, fc_dim=16, feature_dim=FDIM,
                      dropout_i=0.0, dropout_v=0.0)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad")
    tc = TrainConfig(lr=0.1, epochs=epochs, batch_size=(8, 6, 8))
    ls = TSNLoader(src, batch_size=8, num_segments=SEG, mode="test",
                   seed=1)
    lt = TSNLoader(tgt, batch_size=6, num_segments=SEG, mode="test",
                   seed=2)
    lv = TSNLoader(val, batch_size=8, num_segments=SEG, mode="test",
                   shuffle=False)
    return Trainer(cfg, da, tc, ls, lt, lv, use_mesh=False,
                   print_freq=1, show_freq=10 ** 9, eval_freq=1,
                   save_model=True, path_exp=str(tmp_path) + "/")


def test_sigterm_saves_emergency_checkpoint_and_resumes(tmp_path):
    tr = _trainer(tmp_path)
    orig_validate = tr.validate

    def validate_then_preempt(epoch):
        prec1 = orig_validate(epoch)
        if epoch == 2:
            # a real signal, delivered to ourselves mid-fit; the handler
            # installed by fit() runs at the next bytecode boundary
            os.kill(os.getpid(), signal.SIGTERM)
        return prec1

    tr.validate = validate_then_preempt
    with pytest.raises(KeyboardInterrupt, match="SIGTERM"):
        tr.fit()
    # epoch 2 completed -> emergency checkpoint at epoch 2
    assert os.path.exists(os.path.join(str(tmp_path), "checkpoint"))

    tr2 = _trainer(tmp_path)
    start = tr2.resume(os.path.join(str(tmp_path), "checkpoint"))
    assert start == 3  # resumes AFTER the last completed epoch
    best = tr2.fit()   # finishes the remaining epochs cleanly
    assert best >= 0.0


def test_sigterm_disposition_restored_after_fit(tmp_path):
    assert signal.getsignal(signal.SIGTERM) is signal.SIG_DFL
    tr = _trainer(tmp_path, epochs=1)
    tr.fit()
    assert signal.getsignal(signal.SIGTERM) is signal.SIG_DFL


def test_existing_handler_respected():
    """A custom SIGTERM handler installed by the embedding application
    must not be displaced."""
    sentinel = lambda signum, frame: None
    prev = signal.signal(signal.SIGTERM, sentinel)
    try:
        with _sigterm_as_interrupt():
            assert signal.getsignal(signal.SIGTERM) is sentinel
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_noop_off_main_thread():
    """signal.signal raises off the main thread; the guard must not."""
    errors = []

    def body():
        try:
            with _sigterm_as_interrupt():
                pass
        except Exception as e:  # pragma: no cover
            errors.append(e)

    t = threading.Thread(target=body)
    t.start()
    t.join()
    assert not errors


def test_emergency_local_pickle_roundtrips_through_resume(tmp_path):
    """The multi-host emergency path writes a collective-free pickle
    (io_utils.save_emergency_local, ADVICE r4: orbax's save is a
    collective and can deadlock when preemption interrupts hosts at
    different points); Trainer.resume must restore from the .pkl path
    exactly like from an orbax checkpoint dir."""
    import numpy as np

    import jax

    from ta3n_tpu.io_utils.checkpoint import save_emergency_local

    tr = _trainer(tmp_path, epochs=2)
    tr.fit()
    path = save_emergency_local(str(tmp_path),
                                tr._ckpt_payload(2, tr.best_prec1))
    assert path.endswith("emergency.p0.pkl") and os.path.exists(path)

    tr2 = _trainer(tmp_path, epochs=4)
    start = tr2.resume(path, resume_hp=True)
    assert start == 3
    assert int(tr2.state.step) == int(tr.state.step)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(tr2.state.params)[0],
            jax.tree_util.tree_flatten_with_path(tr.state.params)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(kp))
