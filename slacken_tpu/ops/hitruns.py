"""Device computation of the FINAL per-read ordered hit list.

Detailed (per-read) output needs, per read, the ordered (taxon, k-mer
count) runs — TaxonCounts.fromHits semantics (TaxonCounts.scala:31-48)
with Supermers ambiguity handling (Supermers.scala:113-125): valid windows
emit their taxon, char-runs of >= k ambiguous bases emit (A, len-k+1)
pseudo-hits, shorter segments are dropped entirely, adjacent equal taxa
merge ACROSS dropped segments, and paired reads split the list at the mate
border.

The host previously reconstructed this from the dense [B, L] window-taxa
array (12+ MB/batch over a 41 MB/s link, the measured detailed-mode
bottleneck) plus a C++ window walk. This kernel reduces each read to its
runs on device (~90 B/read), so the host only prints.

The mapping onto vector ops: define per window position p
  - emit taxon t[p]      if the window is valid (window_taxa != sentinel),
  - emit AMBIGUOUS (-1)  if all k chars are invalid AND the window lies
                         inside one mate (these positions number exactly
                         len-k+1 per ambiguous char-run),
  - a GAP otherwise.
The ordered hit list is the run-length encoding of the non-gap subsequence
with runs also broken at the mate border — computed with one forward-fill
(cummax + gather) and the scatter-free one-hot run extraction of ops.rle.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["hit_runs", "decode", "DEFAULT_RUNS_PER_ROW"]

#: runs per row budgeted in the fixed-size bundle; rows with more fall back
#: to the host's dense reconstruction (rare: each N adds ~2 runs)
DEFAULT_RUNS_PER_ROW = 16

_I32_MIN = -(2**31)


@partial(jax.jit, static_argnums=(4, 5))
def hit_runs(window_taxa, valid_chars, splits, row_lens, k: int, cap: int):
    """[B, cap + cap//2 + 3] int32 bundle of final hit runs per row.

    window_taxa [B, L] int32 (INVALID_WINDOW sentinel for invalid windows);
    valid_chars [B, L] bool (char < 4); splits [B] int32 (-1 = single-end,
    else the mate-separator column); row_lens [B] int32 (content length).

    Layout per row:
      [:cap]               packed run values ((taxon+2) << 1 | mate;
                           taxon -1 = ambiguous), undefined past nruns
      [cap : cap+cap//2]   run k-mer counts, uint16 pairs packed into int32
      [-3]                 nruns (> cap => overflow, refetch dense)
      [-2], [-1]           per-mate k-mer totals (counts sum; mate2 = 0
                           for single-end rows)
    """
    B, L = window_taxa.shape
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    splits = jnp.asarray(splits, jnp.int32)[:, None]
    row_lens = jnp.asarray(row_lens, jnp.int32)[:, None]
    paired = splits >= 0

    # fully-invalid windows: zero valid chars among p..p+k-1
    inv = (~valid_chars).astype(jnp.int32)
    cs = jnp.cumsum(inv, axis=1)
    cs = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), cs], axis=1)  # [B, L+1]
    hi = jnp.minimum(pos + k, L)
    n_inv = jnp.take_along_axis(cs, hi, axis=1) - jnp.take_along_axis(cs, pos, axis=1)
    win_all_invalid = (n_inv == k) & (pos + k <= L)

    mate_id = (paired & (pos > splits)).astype(jnp.int32)
    m_start = jnp.where(mate_id == 1, splits + 1, 0)
    m_end = jnp.where(paired & (mate_id == 0), splits, row_lens)
    amb = win_all_invalid & (pos >= m_start) & (pos + k <= m_end)

    from .resolve import INVALID_WINDOW

    wv = window_taxa != INVALID_WINDOW
    v = jnp.where(wv, window_taxa, -1)
    nongap = wv | amb

    # forward-fill the previous non-gap (value, mate) to detect run starts
    tag = jnp.where(nongap, pos, -1)
    idx_incl = jax.lax.cummax(tag, axis=1)
    idx_prev = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), idx_incl[:, :-1]], axis=1
    )
    safe_prev = jnp.maximum(idx_prev, 0)
    lastv = jnp.take_along_axis(v, safe_prev, axis=1)
    lastm = jnp.take_along_axis(mate_id, safe_prev, axis=1)
    run_start = nongap & (
        (idx_prev < 0) | (lastv != v) | (lastm != mate_id)
    )
    run_id = jnp.cumsum(run_start.astype(jnp.int32), axis=1) - 1
    nruns = run_id[:, -1] + 1

    pv = ((v + 2) << 1) | mate_id  # taxon -1 (A) encodes as 2 | mate
    onehot = (run_id[:, :, None] == jnp.arange(cap, dtype=jnp.int32)) & nongap[
        :, :, None
    ]
    values = jnp.max(
        jnp.where(onehot, pv[:, :, None], _I32_MIN), axis=1
    ).astype(jnp.int32)
    counts = jnp.sum(onehot.astype(jnp.int32), axis=1)  # [B, cap]
    packed = (counts[:, 0::2] | (counts[:, 1::2] << 16)).astype(jnp.int32)
    t0 = jnp.sum((nongap & (mate_id == 0)).astype(jnp.int32), axis=1)
    t1 = jnp.sum((nongap & (mate_id == 1)).astype(jnp.int32), axis=1)
    return jnp.concatenate(
        [values, packed, nruns[:, None], t0[:, None], t1[:, None]], axis=1
    )


def decode(bundle: np.ndarray, cap: int):
    """Host view of a hit_runs bundle: (values [B, cap] packed, counts
    [B, cap] int64, nruns [B], totals [B, 2], overflow_rows)."""
    values = bundle[:, :cap]
    packed = bundle[:, cap : cap + cap // 2].view(np.uint32)
    counts = np.empty((bundle.shape[0], cap), np.int64)
    counts[:, 0::2] = packed & 0xFFFF
    counts[:, 1::2] = packed >> 16
    nruns = bundle[:, -3]
    totals = bundle[:, -2:]
    return values, counts, nruns, totals, np.flatnonzero(nruns > cap)
