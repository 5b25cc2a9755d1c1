"""Explicit minimizer orderings (MinTable analogue) vs the XOR path and a
naive oracle."""

import numpy as np

from slacken_tpu.ops import ordering
from slacken_tpu.ops.minimizers import MinimizerParams, window_minimizers


def codes_of(rng, n, invalid_frac=0.0):
    c = rng.integers(0, 4, n).astype(np.uint8)
    if invalid_frac:
        c[rng.random(n) < invalid_frac] = 4
    return c


def test_lexicographic_equals_zero_toggle(rng):
    """LUT lexicographic ordering == toggle_mask=0 XOR path (both with and
    without spacing)."""
    for spaces in (0, 2):
        mp = MinimizerParams(k=15, m=8, spaces=spaces, toggle_mask=0)
        lut = ordering.lexicographic_lut(8)
        codes = codes_of(rng, 300, 0.02)[None, :]
        a = window_minimizers(codes, mp)
        b = window_minimizers(codes, mp, lut)
        assert np.array_equal(np.asarray(a.minimizer.lo), np.asarray(b.minimizer.lo))
        assert np.array_equal(np.asarray(a.span_start), np.asarray(b.span_start))
        assert np.array_equal(np.asarray(a.distinct), np.asarray(b.distinct))


def naive_window_min_rank(codes, mp, lut):
    """Oracle: for each valid window, the min rank over its m-mer starts."""
    m, k = mp.m, mp.k
    n = len(codes)
    mask = (
        ordering.space_mask_int(m, mp.spaces) if mp.spaces else (1 << (2 * m)) - 1
    )
    out = []
    for i in range(n - k + 1):
        w = codes[i : i + k]
        if (w >= 4).any():
            out.append(None)
            continue
        best = None
        for j in range(k - m + 1):
            v = 0
            for c in w[j : j + m]:
                v = (v << 2) | int(c)
            if mp.canonical:
                rc = 0
                for c in w[j : j + m][::-1]:
                    rc = (rc << 2) | (int(c) ^ 3)
                v = min(v, rc)
            r = int(lut[v & mask])
            best = r if best is None else min(best, r)
        out.append(best)
    return out


def test_frequency_ordering_vs_oracle(rng):
    mp = MinimizerParams(k=12, m=6, spaces=1)
    sample = [codes_of(rng, 400) for _ in range(3)]
    counts = ordering.sample_mmer_counts(sample, mp)
    lut = ordering.frequency_lut(counts, 6)

    codes = codes_of(rng, 200, 0.03)
    wm = window_minimizers(codes[None, :], mp, lut)
    got_rank = np.asarray(wm.minimizer.lo)[0]
    got_valid = np.asarray(wm.valid)[0]
    want = naive_window_min_rank(codes, mp, lut)
    for i, w in enumerate(want):
        if w is None:
            assert not got_valid[i]
        else:
            assert got_valid[i] and got_rank[i] == w, i


def test_given_ordering(rng):
    m = 4
    motifs = rng.permutation(1 << (2 * m))[:7]
    lut = ordering.given_lut(motifs, m)
    # listed motifs rank 0..6 in order; others follow lexicographically
    for i, mo in enumerate(motifs):
        assert lut[mo] == i
    rest = sorted(set(range(1 << (2 * m))) - set(motifs.tolist()))
    assert np.array_equal(lut[rest], np.arange(7, 7 + len(rest)))
    # ranks are a permutation
    assert np.array_equal(np.sort(lut), np.arange(1 << (2 * m)))


def test_frequency_prefers_rare(rng):
    """A window containing one rare and many common m-mers must pick the
    rare one."""
    m = 3
    counts = np.full(1 << (2 * m), 1000, np.int64)
    rare = 0b010101  # CCC... motif value for "CCC" = 0b010101
    counts[rare] = 1
    lut = ordering.frequency_lut(counts, m)
    assert lut[rare] == 0
    mp = MinimizerParams(k=6, m=3, spaces=0, canonical=False)
    # sequence containing CCC: minimizer rank must be 0 in windows covering it
    codes = np.array([0, 0, 1, 1, 1, 0, 0, 0], np.uint8)  # AACCCAAA
    wm = window_minimizers(codes[None, :], mp, lut)
    assert np.asarray(wm.minimizer.lo)[0, 0] == 0
