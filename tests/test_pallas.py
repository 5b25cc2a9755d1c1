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
