"""Pallas kernels must agree exactly with the XLA reference implementations
(interpret mode on CPU; compiled path exercised on real TPU)."""

import numpy as np

from slacken_tpu.ops import minimizers, u64
from slacken_tpu.ops.minimizers import MinimizerParams
from slacken_tpu.ops.pallas_kernels import window_minimizers_pallas


def test_pallas_scan_matches_xla(rng):
    params = MinimizerParams()
    codes = rng.integers(0, 5, (16, 256)).astype(np.uint8)  # includes invalid
    want = minimizers.window_minimizers(codes, params)
    got = window_minimizers_pallas(codes, params, 8, True)
    assert np.array_equal(u64.to_ints(got.minimizer), u64.to_ints(want.minimizer))
    assert np.array_equal(np.asarray(got.valid), np.asarray(want.valid))
    assert np.array_equal(np.asarray(got.span_start), np.asarray(want.span_start))
    assert np.array_equal(np.asarray(got.distinct), np.asarray(want.distinct))


def test_dma_probe_matches_reference(rng):
    """Experimental block-DMA probe (interpret mode) vs plain lookup."""
    import jax.numpy as jnp

    from slacken_tpu.ops import lookup as lookup_ops
    from slacken_tpu.ops.pallas_kernels import build_fence, lookup_taxa_dma

    n = 5000
    keys = np.unique(rng.integers(1, 1 << 40, 3 * n).astype(np.uint64))[:n]
    taxa = rng.integers(1, 1000, n).astype(np.int32)
    kh = (keys >> np.uint64(32)).astype(np.uint32)
    kl = keys.astype(np.uint32)
    fh, fl, n_blocks = build_fence(kh, kl)

    q = np.concatenate([keys[rng.integers(0, n, 300)], rng.integers(1, 1 << 40, 200).astype(np.uint64)])
    rng.shuffle(q)
    qh = (q >> np.uint64(32)).astype(np.uint32)
    ql = q.astype(np.uint32)

    got = np.asarray(lookup_taxa_dma(kh, kl, taxa, fh, fl, qh, ql, interpret=True))
    want = np.asarray(
        lookup_ops.lookup_taxa(lookup_ops.keys_from_numpy(keys), jnp.asarray(taxa), lookup_ops.keys_from_numpy(q))
    )
    assert np.array_equal(got, want)
