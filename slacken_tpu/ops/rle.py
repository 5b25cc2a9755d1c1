"""Device run-length encoding of per-read window-taxon rows.

Detailed (per-read) output needs the full [B, L] window_taxa array on the
host to format hit lines (TaxonCounts.scala:31-48 semantics, implemented in
native/packer.cpp stpu_hit_lines). Consecutive windows overwhelmingly share
a taxon (a read aligning to one genome is one long run; misses merge into
taxon-0 runs; invalid windows merge into sentinel runs), so transferring a
row-aware RLE instead of the dense array cuts device->host bytes ~4-8x —
which matters because that transfer is the measured bottleneck of detailed
mode (STATUS.md: 41 MB/s d2h on the axon tunnel, 388 ms per 12 MB batch).

The encoding is lossless; the host reconstructs the exact dense array with
one np.repeat and hands it to the unchanged formatter.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["encode_rows", "decode_rows", "DEFAULT_RUNS_PER_ROW"]

#: runs per row budgeted in the fixed-size bundle. Real reads produce ~2-6
#: runs (hit spans merge by taxon; miss/invalid windows coalesce); 16 leaves
#: room for chimeric reads. Overflow is flagged and the caller falls back to
#: the dense transfer.
DEFAULT_RUNS_PER_ROW = 16


@partial(jax.jit, static_argnums=(1,))
def encode_rows(wt: jnp.ndarray, cap: int) -> jnp.ndarray:
    """RLE of each row of int32 [B, L] into ONE flat int32 bundle.

    Layout (single array so the host pays one transfer):
      bundle[0]            total number of runs (> cap means overflow:
                           the bundle is unusable, fall back to dense)
      bundle[1 : 1+B]      runs per row
      bundle[1+B : 1+B+cap]        run values (slots >= total undefined)
      bundle[1+B+cap : 1+B+2*cap]  run lengths (unused slots are 0)

    Runs never cross row boundaries, so decode can reshape to [B, L].
    """
    B, L = wt.shape
    flat = wt.reshape(-1)
    pos = jnp.arange(B * L, dtype=jnp.int32)
    prev = jnp.concatenate([flat[:1], flat[:-1]])
    is_start = (flat != prev) | (pos % L == 0)
    run_idx = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    total = run_idx[-1] + 1
    # scatter each run's start position into its slot (drop past-cap runs)
    start_pos = jnp.full(cap, B * L, jnp.int32)
    start_pos = start_pos.at[jnp.where(is_start, run_idx, cap)].set(
        pos, mode="drop"
    )
    values = flat[jnp.minimum(start_pos, B * L - 1)]
    next_start = jnp.concatenate(
        [start_pos[1:], jnp.full((1,), B * L, jnp.int32)]
    )
    # unused slots: B*L - B*L = 0. The LAST real run's "next start" is an
    # unused slot's sentinel B*L, which is exactly its end.
    lengths = jnp.maximum(next_start - start_pos, 0)
    nruns = is_start.reshape(B, L).sum(axis=1, dtype=jnp.int32)
    return jnp.concatenate(
        [total[None], nruns, values.astype(jnp.int32), lengths]
    )


def decode_rows(bundle: np.ndarray, B: int, L: int, cap: int):
    """Reconstruct the dense [B, L] int32 array from encode_rows' bundle on
    the host. Returns None on overflow (caller transfers dense instead)."""
    total = int(bundle[0])
    if total > cap:
        return None
    values = bundle[1 + B : 1 + B + cap]
    lengths = bundle[1 + B + cap : 1 + B + 2 * cap]
    return np.repeat(values, lengths).reshape(B, L)
