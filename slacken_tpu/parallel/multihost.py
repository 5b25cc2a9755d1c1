"""Multi-host (DCN) execution support.

The reference scales across machines with a Spark cluster (SparkTool.scala:
31-41 builds the session; the shuffle rides the cluster network). The TPU
analogue is a multi-host JAX program: one Python process per host, connected
with `jax.distributed`, devices of all hosts forming one global mesh.
Classification collectives are laid out so the heavy traffic (ring query
rotation) rides ICI inside each pod slice, and only report-count psums cross
DCN.

Usage (same script on every host):

    from slacken_tpu.parallel import multihost

    ctx = multihost.initialize()                # no-op on a single host
    idx = multihost.load_index_for_host("gs://.../idx_sharded", ctx)
    mesh = multihost.global_mesh()
    ...

On a single host (or when `jax.distributed` env vars are absent) every
function degenerates to the local behaviour, so the same program runs
unchanged from a laptop to a pod — there is no separate cluster code path
to maintain (contrast the reference's Spark-vs-local duality).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional

import numpy as np


@dataclass
class HostContext:
    """This process's place in the (possibly single-host) job."""

    process_index: int
    process_count: int
    local_device_count: int
    global_device_count: int

    @property
    def is_distributed(self) -> bool:
        return self.process_count > 1


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> HostContext:
    """Initialize multi-host JAX if configured; otherwise return the local
    single-process context.

    Distribution is requested either via explicit arguments or the standard
    environment (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID,
    or a TPU pod metadata server that `jax.distributed.initialize()` detects
    on its own). Safe to call multiple times."""
    import jax

    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if explicit and jax.process_count() == 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return HostContext(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_device_count=jax.local_device_count(),
        global_device_count=jax.device_count(),
    )


def global_mesh(axis: str = "data"):
    """1-D mesh over ALL devices of all hosts, in (process, local device)
    order so contiguous index ranges land on contiguous hosts."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))


def host_shard_ids(n_shards: int, ctx: HostContext) -> List[int]:
    """Contiguous shard-id range owned by this host (ranges in rank order so
    the concatenation across hosts is the globally sorted key array)."""
    bounds = np.linspace(0, n_shards, ctx.process_count + 1).astype(int)
    return list(range(bounds[ctx.process_index], bounds[ctx.process_index + 1]))


def load_index_for_host(location: str, ctx: HostContext, taxonomy=None):
    """Load only this host's key-range shards from a `save_sharded` layout.

    Each host holds 1/process_count of the sorted key array; together the
    hosts' ranges tile the index exactly — the DCN analogue of the
    reference's bucketed Parquet table being read partition-wise by Spark
    executors (KeyValueIndex.scala:150-159)."""
    import json

    from .. import storage
    from ..index import KeyValueIndex

    with storage.open_file(storage.join(location, "params.json")) as f:
        n_shards = len(json.load(f)["shards"])
    ids = host_shard_ids(n_shards, ctx)
    return KeyValueIndex.load_shards(location, ids, taxonomy=taxonomy)


def ring_index_for_host(location: str, ctx: HostContext, mesh):
    """Assemble the GLOBAL ring-sharded index arrays over `mesh`, each host
    loading only its own key-range shard files.

    Device d of the mesh owns global key range d (contiguous shard files
    d*s0..(d+1)*s0); this process loads and pads only the rows of its own
    devices and contributes them to global jax Arrays via
    `jax.make_array_from_process_local_data`. Rows are sentinel-padded to a
    common length (the all-ones key never matches a query — same convention
    as mesh.shard_index_by_range). Returns
    (keys_hi, keys_lo, taxa, routers, rounds, bits, params) ready for
    `mesh.classify_ring_fn`. This is the DCN analogue of Spark executors each
    reading their partitions of the bucketed Parquet table
    (KeyValueIndex.scala:150-159)."""
    import json

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .. import storage
    from ..index import IndexParams
    from ..ops import lookup as lookup_ops

    with storage.open_file(storage.join(location, "params.json")) as f:
        meta = json.load(f)
    params = IndexParams.from_json(meta)
    sizes = meta["shards"]
    n_shards = len(sizes)
    n = mesh.devices.size
    if n_shards % n:
        raise ValueError(f"{n_shards} shard files not divisible by {n} devices")
    s0 = n_shards // n
    dev_sizes = [sum(sizes[d * s0 : (d + 1) * s0]) for d in range(n)]
    row_len = max(max(dev_sizes), 1)
    bits = lookup_ops.adaptive_router_bits(row_len)

    devs = list(mesh.devices.flat)
    local_rows = [
        d for d in range(n) if devs[d].process_index == ctx.process_index
    ]
    sent = np.uint64(0xFFFFFFFFFFFFFFFF)
    kh, kl, tx, rt = [], [], [], []
    rounds = 1
    for d in local_rows:
        ids = range(d * s0, (d + 1) * s0)
        keys = np.concatenate(
            [storage.np_load(storage.join(location, f"keys.{i:05d}.npy")) for i in ids]
        )
        taxa = np.concatenate(
            [storage.np_load(storage.join(location, f"taxa.{i:05d}.npy")) for i in ids]
        )
        pad = row_len - len(keys)
        keys = np.concatenate([keys, np.full(pad, sent)])
        taxa = np.concatenate([taxa, np.zeros(pad, np.int32)]).astype(np.int32)
        router = lookup_ops.build_router(keys, bits)
        rounds = max(rounds, lookup_ops.router_rounds(router))
        kh.append((keys >> np.uint64(32)).astype(np.uint32))
        kl.append(keys.astype(np.uint32))
        tx.append(taxa)
        rt.append(router)

    if ctx.is_distributed:
        from jax.experimental import multihost_utils

        rounds = int(multihost_utils.process_allgather(np.array([rounds])).max())

    sh = NamedSharding(mesh, P("data"))

    def mk(rows):
        local = np.stack(rows)
        return jax.make_array_from_process_local_data(
            sh, local, global_shape=(n,) + local.shape[1:]
        )

    return mk(kh), mk(kl), mk(tx), mk(rt), rounds, bits, params


def global_rows(local_rows: np.ndarray, mesh):
    """Build a global [B, ...] jax Array sharded over mesh axis 0 from this
    process's rows (each process contributes B/process_count rows)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("data"))
    b_global = local_rows.shape[0] * jax.process_count()
    return jax.make_array_from_process_local_data(
        sh, local_rows, global_shape=(b_global,) + local_rows.shape[1:]
    )


def collect_local(global_array) -> np.ndarray:
    """Concatenate this process's addressable shards of a global array in
    global row order."""
    shards = sorted(global_array.addressable_shards, key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards])


def report_counts_across_hosts(local_counts: np.ndarray) -> np.ndarray:
    """Sum per-taxon report counts over all hosts (psum over DCN; the only
    cross-host traffic in replicated classification). Host-level numpy
    fallback when not distributed."""
    import jax

    if jax.process_count() == 1:
        return np.asarray(local_counts)
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(np.asarray(local_counts)).sum(axis=0)
    )
