"""Fused gather+GEMM kernel: interpreter-mode equivalence with the XLA
gather+einsum oracle (the TPU-compiled path is A/B'd on hardware in
BENCH_NOTES.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ta3n_tpu.ops.gather_gemm import (gathered_gemm, gathered_gemm_reference,
                                      pack_store, unpack_store)

R, D, H = 64, 256, 32  # D//128 = 2 subtiles


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    store = rng.normal(size=(R, D)).astype(np.float32)
    idx = rng.integers(0, R, size=37).astype(np.int32)
    w = rng.normal(scale=0.05, size=(D, H)).astype(np.float32)
    return jnp.asarray(store), jnp.asarray(idx), jnp.asarray(w)


def test_pack_unpack_roundtrip(data):
    store, _, _ = data
    np.testing.assert_array_equal(np.asarray(unpack_store(pack_store(store))),
                                  np.asarray(store))


@pytest.mark.parametrize("mode", ["slices", "reshape"])
def test_fused_matches_oracle(data, mode):
    store, idx, w = data
    store3 = pack_store(store)
    want_z, want_x = gathered_gemm_reference(store3, idx, w)
    got_z, got_x = gathered_gemm(store3, idx, w, tile_rows=16, mode=mode,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(got_x), np.asarray(want_x))
    np.testing.assert_allclose(np.asarray(got_z), np.asarray(want_z),
                               rtol=1e-5, atol=1e-5)


def test_fused_single_tile(data):
    store, idx, w = data
    store3 = pack_store(store)
    want_z, _ = gathered_gemm_reference(store3, idx[:8], w)
    got_z, _ = gathered_gemm(store3, idx[:8], w, tile_rows=64,
                             mode="slices", interpret=True)
    np.testing.assert_allclose(np.asarray(got_z), np.asarray(want_z),
                               rtol=1e-5, atol=1e-5)
