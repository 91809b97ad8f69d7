"""Device-side TSN index pipeline: epoch shuffling + segment sampling
inside the jitted train step.

The host loader (data/loader.py) replaces the reference's DataLoader
worker processes (main.py:169-200) with a vectorised numpy pipeline —
but in the K-steps-per-dispatch production mode the per-call
host->device upload of stacked index/label/mask batches (~5 KB/step)
and the single-core host sampling become the residual bottleneck: the
profiled device floor is ~284 us/step while the end-to-end step is
~323 us (BENCH_NOTES.md).  This module moves the whole index pipeline
onto the accelerator: per-epoch `jax.random.permutation` order, the
three TSN samplers (dataset.py:76-116 semantics, same math as
data/samplers.py), new_length expansion, and the offset arithmetic all
trace into the scan body — the only per-call host traffic left is the
schedule scalars.

Sampling parity note: deterministic modes ('val'/'test') produce
BITWISE the host loader's indices — guaranteed by construction: their
per-record frame indices are precomputed on the host with the actual
host samplers and gathered on device (an on-device integer re-derivation
of the float64 central formula diverges for some (segments, num_frames)
pairs, e.g. S=7 nf=12 — caught in review, regression-tested at S=7).
'random' mode draws from a counter-keyed PRNG instead of the host's
sequential numpy Generator — same distribution (chunk-aligned offsets,
sorted fallback), different stream; runs are deterministic given the
seed.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ta3n_tpu.data.loader import TSNLoader

__all__ = ["DeviceSampler", "StreamingDeviceSampler",
           "plan_zip_shard_chunks"]


def plan_zip_shard_chunks(sampler_s, sampler_t, steps_per_call: int):
    """Host-side chunk plan for one streamed epoch with BOTH streams'
    shard progressions zipped (main.py:330 zip-shortest semantics):
    returns [(sid_s, j0_s, sid_t, j0_t, k)] with chunks breaking
    whenever EITHER stream switches shards and k <= steps_per_call."""
    def seq_of(sampler):
        return [(sid, j) for sid in range(sampler.num_shards)
                for j in range(sampler.shard_steps(sid))]

    a, b = seq_of(sampler_s), seq_of(sampler_t)
    n = min(len(a), len(b))
    chunks = []
    i = 0
    while i < n:
        sid_s, j0_s = a[i]
        sid_t, j0_t = b[i]
        k = 1
        while (k < steps_per_call and i + k < n
               and a[i + k][0] == sid_s and b[i + k][0] == sid_t):
            k += 1
        chunks.append((sid_s, j0_s, sid_t, j0_t, k))
        i += k
    return chunks


class DeviceSampler:
    """Traced index-batch generator bound to one loader's records."""

    def __init__(self, loader: TSNLoader, seed: int = 0):
        store = loader.store
        # per-record row offset into the packed store (list repetition —
        # dataset.py:69-74 — is already reflected in loader.video_idx)
        self.offsets = jnp.asarray(
            np.asarray(store.offsets)[loader.video_idx], jnp.int32)
        self.num_frames = jnp.asarray(loader.num_frames, jnp.int32)
        self.labels = jnp.asarray(loader.labels, jnp.int32)
        # packed per-record fields: ONE gather per batch instead of three
        # (row gathers are latency-bound, ~26 ns/row — profiled)
        self._fields = jnp.stack(
            [self.offsets, self.num_frames, self.labels], axis=1)
        self.n = len(loader.records)
        self.batch_size = loader.batch_size
        self.pad_to = max(loader.pad_to, loader.batch_size)
        self.steps_per_epoch = len(loader)
        self.num_segments = loader.num_segments
        self.new_length = loader.new_length
        self.mode = loader.mode
        self.shuffle = loader.shuffle
        key = jax.random.PRNGKey(seed)
        self._perm_key, self._samp_key = jax.random.split(key)
        # deterministic modes: precompute each record's frame indices ON
        # THE HOST with the actual host sampler — bitwise parity by
        # construction (an integer re-derivation of the float64 central
        # formula diverges for some (segments, num_frames) pairs, e.g.
        # S=7, nf=12), and batch() reduces to one row gather
        self._det_frames = None
        if self.mode in ("val", "test"):
            from ta3n_tpu.data.samplers import (expand_new_length,
                                                sample_indices_test,
                                                sample_indices_val)
            nf_host = np.asarray(loader.num_frames)
            sampler = (sample_indices_val if self.mode == "val"
                       else sample_indices_test)
            starts = sampler(nf_host, self.num_segments, self.new_length)
            frames = expand_new_length(starts, nf_host, self.new_length)
            self._det_frames = jnp.asarray(frames, jnp.int32)  # [N, T]

    def epoch_order(self, epoch: jax.Array) -> jax.Array:
        """Record visit order for one epoch ([n] int32).  A permutation
        is a full sort of n random keys — expensive per step, cheap per
        epoch; multi-step callers hoist it out of the scan
        (make_sampled_multi_step)."""
        if not self.shuffle:
            return jnp.arange(self.n)
        return jax.random.permutation(
            jax.random.fold_in(self._perm_key, epoch), self.n)

    # ---- traced batch construction ----
    def batch(self, step: jax.Array, order: jax.Array = None
              ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """step: traced int32 global step -> (abs_idx [P, T] int32,
        labels [P] int32, mask [P] float32); P = pad_to.
        ``order``: optionally the precomputed epoch_order(step // spe)."""
        spe = self.steps_per_epoch
        i = step % spe
        if order is None:
            order = self.epoch_order(step // spe)
        pos = i * self.batch_size + jnp.arange(self.pad_to)
        valid = jnp.logical_and(pos < self.n,
                                jnp.arange(self.pad_to) < self.batch_size)
        sel = order[jnp.clip(pos, 0, self.n - 1)]
        sel = jnp.where(valid, sel, 0)

        fields = self._fields[sel]  # one row gather for all three fields
        offs, nf, labels = fields[:, 0], fields[:, 1], fields[:, 2]
        if self._det_frames is not None:  # val/test: host-precomputed
            frames = self._det_frames[sel]
        else:
            starts = self._sample(nf,
                                  jax.random.fold_in(self._samp_key, step))
            frames = self._expand_new_length(starts, nf)
        abs_idx = (offs[:, None] + frames).astype(jnp.int32)
        mask = valid.astype(jnp.float32)
        abs_idx = jnp.where(valid[:, None], abs_idx, 0)  # masked rows: row 0
        return abs_idx, labels, mask

    # ---- samplers: jnp mirrors of data/samplers.py ----
    def _sample(self, nf: jax.Array, key: jax.Array) -> jax.Array:
        s, l = self.num_segments, self.new_length
        if self.mode == "random":  # dataset.py:76-90
            b = nf.shape[0]
            avg = (nf - l + 1) // s
            base = jnp.arange(s)[None, :] * avg[:, None]
            k1, k2 = jax.random.split(key)
            r = jax.random.randint(k1, (b, s), 0,
                                   jnp.maximum(avg, 1)[:, None])
            case1 = base + r
            hi = jnp.maximum(nf - l + 1, 1)
            case2 = jnp.sort(
                jax.random.randint(k2, (b, s), 0, hi[:, None]), axis=1)
            zeros = jnp.zeros((b, s), jnp.int32)
            return jnp.where((avg > 0)[:, None], case1,
                             jnp.where((nf > s)[:, None], case2, zeros)
                             ).astype(jnp.int32)
        # val/test never reach here: their (deterministic) indices are
        # host-precomputed in __init__ for bitwise parity — the float64
        # central formula is not reproducible in device integer math for
        # every (segments, num_frames) pair
        raise ValueError(f"unsupported on-device sampling mode "
                         f"{self.mode}")

    def _expand_new_length(self, starts: jax.Array, nf: jax.Array
                           ) -> jax.Array:
        """[P, S] -> [P, S*new_length], clamped at the last frame
        (dataset.py:128-144)."""
        l = self.new_length
        if l == 1:
            return starts
        steps = jnp.arange(l)[None, None, :]
        frames = starts[:, :, None] + steps
        frames = jnp.minimum(frames, (nf - 1)[:, None, None])
        p, s, _ = frames.shape
        return frames.reshape(p, s * l)


class StreamingDeviceSampler(DeviceSampler):
    """Device-side index pipeline for the larger-than-HBM streaming mode
    (data/streaming.py): batches are generated shard-locally inside the
    compiled scan, removing the last host sampler from the streamed path
    (VERDICT r2 next-#7; the reference's premise that loading scales to
    any dataset size is dataset.py:53-66).

    Mirrors TSNLoader.shard_index_epoch EXACTLY for deterministic modes
    (shuffle off, val/test sampling — bitwise parity test-enforced):
    shard-local record groups in loader order, per-shard tails padded +
    masked, masked rows reading local row 0 with record-0 labels.  With
    shuffle on, the within-shard permutation is drawn from a keyed PRNG
    (same shuffle-window semantics, different stream than the host's
    numpy Generator — like DeviceSampler's random mode).
    """

    def __init__(self, loader: TSNLoader, plan, seed: int = 0):
        super().__init__(loader, seed)
        sid_of_record = np.asarray(plan.shard_of(loader.video_idx))
        ns = plan.num_shards
        groups = [np.nonzero(sid_of_record == s)[0] for s in range(ns)]
        self.gmax = max(len(g) for g in groups)
        gp = np.zeros((ns, self.gmax), np.int32)
        counts = np.zeros(ns, np.int32)
        for s, g in enumerate(groups):
            gp[s, :len(g)] = g
            counts[s] = len(g)
        self.num_shards = ns
        self.groups = jnp.asarray(gp)            # [NS, Gmax], valid-first
        self.shard_counts = jnp.asarray(counts)
        self.shard_counts_host = counts
        self.row_lo = jnp.asarray(np.asarray(plan.row_lo), jnp.int32)

    def shard_steps(self, sid: int) -> int:
        """Batches shard ``sid`` contributes per epoch (host int)."""
        return int(-(-int(self.shard_counts_host[sid]) // self.batch_size))

    def shard_order(self, sid: jax.Array, epoch: jax.Array) -> jax.Array:
        """Within-shard record visit order for one epoch ([Gmax] int32
        slot indices into groups[sid]; invalid slots sort last)."""
        if not self.shuffle:
            return jnp.arange(self.gmax)
        key = jax.random.fold_in(
            jax.random.fold_in(self._perm_key, epoch), sid)
        u = jax.random.uniform(key, (self.gmax,))
        u = jnp.where(jnp.arange(self.gmax) < self.shard_counts[sid],
                      u, 2.0)  # invalid slots: sort to the tail
        return jnp.argsort(u).astype(jnp.int32)

    def shard_batch(self, sid: jax.Array, j: jax.Array,
                    order: jax.Array, step: jax.Array):
        """Shard-local batch j -> (abs_idx [P, T] SHARD-LOCAL rows,
        labels [P], mask [P]).  ``step`` keys the random-mode sampler."""
        count = self.shard_counts[sid]
        pos = j * self.batch_size + jnp.arange(self.pad_to)
        valid = jnp.logical_and(
            pos < count, jnp.arange(self.pad_to) < self.batch_size)
        slot = order[jnp.clip(pos, 0, self.gmax - 1)]
        sel = self.groups[sid][slot]
        # host pads with record position 0 (global) — mirror exactly
        sel = jnp.where(valid, sel, 0)

        fields = self._fields[sel]
        offs, nf, labels = fields[:, 0], fields[:, 1], fields[:, 2]
        if self._det_frames is not None:
            frames = self._det_frames[sel]
        else:
            starts = self._sample(nf,
                                  jax.random.fold_in(self._samp_key, step))
            frames = self._expand_new_length(starts, nf)
        abs_idx = (offs[:, None] + frames - self.row_lo[sid]).astype(
            jnp.int32)
        mask = valid.astype(jnp.float32)
        abs_idx = jnp.where(valid[:, None], abs_idx, 0)
        return abs_idx, labels, mask
