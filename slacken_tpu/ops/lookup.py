"""Sorted-array key lookup on device.

The index is a pair of sorted uint32 limb arrays (hi, lo) + an int32 taxon
per key, resident in HBM. Lookup is a branchless binary search, vectorised
over all queries: ceil(log2 N) rounds of two gathers each.

This replaces the reference's shuffle join against bucketed Parquet
(KeyValueIndex.scala:188-217): instead of routing spans to the partition
holding their minimizer, every device holds (a shard of) the sorted key
array and probes it locally.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import u64
from .u64 import U64


def keys_from_numpy(keys: np.ndarray) -> U64:
    """Split a uint64 numpy array into uint32 limb arrays."""
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    hi = (keys >> np.uint64(32)).astype(np.uint32)
    lo = keys.astype(np.uint32)
    return U64(jnp.asarray(hi), jnp.asarray(lo))


def lower_bound(keys: U64, q: U64) -> jnp.ndarray:
    """Index of the first key >= q (vectorised over q's shape)."""
    n = keys.hi.shape[0]
    nbits = max(1, (n).bit_length())
    pos = jnp.zeros(q.hi.shape, jnp.int32)
    for b in reversed(range(nbits)):
        mid = pos + (1 << b)
        idx = jnp.minimum(mid - 1, n - 1)
        k_at = U64(keys.hi[idx], keys.lo[idx])
        ok = (mid <= n) & u64.ltu(k_at, q)
        pos = jnp.where(ok, mid, pos)
    return pos


@jax.jit
def lookup_taxa(keys: U64, taxa: jnp.ndarray, q: U64) -> jnp.ndarray:
    """Look up LCA taxa for query minimizers; misses return NONE (0),
    mirroring the left join + NONE fill (KeyValueIndex.scala:176-185)."""
    n = keys.hi.shape[0]
    if n == 0:
        return jnp.zeros(q.hi.shape, jnp.int32)
    pos = lower_bound(keys, q)
    idx = jnp.minimum(pos, n - 1)
    k_at = U64(keys.hi[idx], keys.lo[idx])
    found = (pos < n) & u64.eq(k_at, q)
    return jnp.where(found, taxa[idx], 0).astype(jnp.int32)
