"""Sharded classification on the 8-device virtual CPU mesh must agree with
the single-device path exactly."""

import numpy as np

from slacken_tpu.index import IndexParams, KeyValueIndex
from slacken_tpu.ops.minimizers import MinimizerParams
from slacken_tpu.parallel import mesh as pmesh
from test_index import make_genomes, random_genome
from test_taxonomy import random_taxonomy


def test_dryrun_entrypoints():
    import __graft_entry__ as g
    import jax

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.asarray(out[0]).shape == args[0].shape
    g.dryrun_multichip(8)
    g.dryrun_multichip(3)  # non-power-of-two ring


def test_ring_matches_single_device(rng):
    t = random_taxonomy(rng)
    genomes = make_genomes(rng, t, n_genomes=5, length=900)
    idx = KeyValueIndex.build(genomes, IndexParams(), t)
    mp = idx.params.minimizer_params
    max_path = t.max_path_len

    # reads
    reads = []
    for _ in range(16):
        _, g = genomes[int(rng.integers(len(genomes)))]
        s = int(rng.integers(0, len(g) - 101))
        reads.append(g[s : s + 101])
    from slacken_tpu.ops import encode

    codes, _ = encode.pack_batch(reads, 128)

    n = 8
    m = pmesh.make_mesh(n)
    kh = (idx.keys >> np.uint64(32)).astype(np.uint32)
    kl = idx.keys.astype(np.uint32)

    table = t.rpath_table()
    rep = pmesh.classify_replicated_fn(m, mp, 16, idx.router_rounds, idx.router_bits)
    wt_p, nd_p, ch_p, res_p, counts_p = rep(
        codes, kh, kl, idx.taxa, np.asarray(idx.device_router), table
    )

    sk, st = pmesh.shard_index_by_range(idx.keys, idx.taxa, n)
    routers, rounds, rbits = pmesh.shard_routers(sk)
    ring = pmesh.classify_ring_fn(m, mp, 16, rounds, rbits)
    wt_r, nd_r, ch_r, res_r, counts_r = ring(
        codes, (sk >> np.uint64(32)).astype(np.uint32), sk.astype(np.uint32), st,
        routers, table
    )

    # single-device reference
    from slacken_tpu.classify import _classify_kernel

    wt_1, nd_1, ch_1, res_1 = _classify_kernel(
        codes, kh, kl, idx.taxa, idx.device_router, table, mp, 16,
        idx.router_rounds, idx.router_bits,
    )

    assert np.array_equal(np.asarray(wt_p), np.asarray(wt_1))
    assert np.array_equal(np.asarray(wt_r), np.asarray(wt_1))
    assert np.array_equal(np.asarray(nd_r), np.asarray(nd_1))
    assert np.array_equal(np.asarray(res_r.max_taxon), np.asarray(res_1.max_taxon))
    assert np.array_equal(np.asarray(res_r.clade), np.asarray(res_1.clade))
    # report psum counts match a host bincount of max_taxon
    want_counts = np.bincount(np.asarray(res_1.max_taxon), minlength=t.size)
    assert np.array_equal(np.asarray(counts_r), want_counts)
    assert np.array_equal(np.asarray(counts_p), want_counts)
