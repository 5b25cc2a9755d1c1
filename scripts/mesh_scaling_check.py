#!/usr/bin/env python
"""Validate the ring-vs-replicated scaling model's STRUCTURE on the virtual
8-CPU mesh (VERDICT r4 #9).

The ICI byte budget in docs/PERF.md claims the ring's extra cost over the
replicated layout is linear in hops x bytes/hop: (n-1) query+answer hops of
12 B/span-slot (+ one 4 B answer hop). Real ICI is unreachable here, so this
checks the RELATIVE accounting on the virtual CPU mesh, where the "wire" is
a memcpy: for n = 2, 4, 8 and two batch sizes, measure ring and replicated
wall time on identical inputs and fit extra_time(n) against (n-1).
CPU != ICI — absolute hop costs mean nothing — but if the model's structure
is right, extra_time should grow ~linearly in (n-1) with a roughly
batch-size-proportional slope (bytes/hop scales with slots = 0.4 x B x L).

Writes .tpu_results/mesh_scaling_cpu.json and prints a table.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from slacken_tpu.index import KeyValueIndex
    from slacken_tpu.ops import encode
    from slacken_tpu.parallel import mesh as pmesh

    idx = KeyValueIndex.load("/root/repo/.bench_cache/idx")
    mp = idx.params.minimizer_params
    table = idx.taxonomy.rpath_table()
    rng = np.random.default_rng(1)
    keys = np.asarray(idx.keys, np.uint64)
    taxa = np.asarray(idx.taxa, np.int32)

    from slacken_tpu.ops import lookup as lookup_ops

    results = {"model": "extra = a * (n-1) per batch; slots = 0.4*B*L"}
    lut = np.frombuffer(b"ACGT", np.uint8)
    for B in (1024, 4096):
        reads = ["".join(map(chr, lut[rng.integers(0, 4, 101)])) for _ in range(B)]
        codes, _ = encode.pack_batch(reads, 128)
        rows = {}
        for n in (2, 4, 8):
            m = pmesh.make_mesh(n)
            fbits = lookup_ops.adaptive_router_bits(len(keys))
            fr = lookup_ops.build_router(keys, fbits)
            rep = pmesh.classify_replicated_fn(
                m, mp, 16, lookup_ops.router_rounds(fr), fbits
            )
            kh = (keys >> np.uint64(32)).astype(np.uint32)
            kl = keys.astype(np.uint32)

            def time_fn(fn, args, reps=5):
                out = fn(*args)
                jax.block_until_ready(out)
                best = float("inf")
                for _ in range(reps):
                    t0 = time.perf_counter()
                    out = fn(*args)
                    jax.block_until_ready(out)
                    best = min(best, time.perf_counter() - t0)
                return best

            t_rep = time_fn(rep, (codes, kh, kl, taxa, fr, table))
            sk, st = pmesh.shard_index_by_range(keys, taxa, n)
            routers, rounds, rbits = pmesh.shard_routers(sk)
            ring = pmesh.classify_ring_fn(m, mp, 16, rounds, rbits)
            t_ring = time_fn(
                ring,
                (
                    codes,
                    (sk >> np.uint64(32)).astype(np.uint32),
                    sk.astype(np.uint32),
                    st, routers, table,
                ),
            )
            rows[n] = {
                "replicated_s": round(t_rep, 4),
                "ring_s": round(t_ring, 4),
                "extra_s": round(t_ring - t_rep, 4),
            }
            print(
                f"B={B} n={n}: replicated {t_rep*1e3:7.1f} ms  "
                f"ring {t_ring*1e3:7.1f} ms  extra {1e3*(t_ring-t_rep):7.1f} ms"
            )
        # linear fit extra vs (n-1)
        ns = np.array(sorted(rows))
        extra = np.array([rows[n]["extra_s"] for n in ns])
        A = np.stack([ns - 1, np.ones_like(ns)], axis=1).astype(float)
        coef, res, *_ = np.linalg.lstsq(A, extra, rcond=None)
        pred = A @ coef
        ss_tot = ((extra - extra.mean()) ** 2).sum()
        r2 = 1 - (((extra - pred) ** 2).sum() / ss_tot if ss_tot else 0.0)
        rows["fit"] = {
            "per_hop_s": round(float(coef[0]), 4),
            "intercept_s": round(float(coef[1]), 4),
            "r2": round(float(r2), 3),
        }
        print(
            f"B={B}: extra ~= {coef[0]*1e3:.1f} ms/hop + {coef[1]*1e3:.1f} ms "
            f"(R^2 {r2:.3f})"
        )
        results[f"B{B}"] = rows
    out = "/root/repo/.tpu_results/mesh_scaling_cpu.json"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("->", out)


if __name__ == "__main__":
    main()
