#!/usr/bin/env python
"""One-process TPU experiment session.

The axon tunnel is single-client and drops for 20-60+ min after any client
exits, so EVERY TPU measurement this round is batched into this script
(see memory notes / CLAUDE.md). Results are flushed to
.tpu_results/r2_session.json after every experiment so a mid-run tunnel
death loses nothing.

Experiments:
  device/transfer   tunnel + HBM characterisation (roofline inputs)
  scan              window_minimizers XLA vs Pallas fused kernel
  probe             routed binary search vs direct-bucket vs Pallas DMA
  kernel            full classify kernel, component breakdown, batch sweep
  e2e               classify_packed host pipeline (packed-transfer x probe)
  bracken           device window kernel vs adaptive numpy path
  build             device build kernel Mbp/s
"""

import json
import os
import sys
import time

import numpy as np

RESULTS_PATH = os.environ.get(
    "STPU_RESULTS", "/root/repo/.tpu_results/r2_session.json"
)
results = {"started": time.strftime("%F %T")}


def record(name, **kv):
    results[name] = kv
    os.makedirs(os.path.dirname(RESULTS_PATH), exist_ok=True)
    with open(RESULTS_PATH, "w") as f:
        json.dump(results, f, indent=2, default=str)
    print(f"[{time.strftime('%T')}] {name}: {kv}", file=sys.stderr, flush=True)


def guard(name):
    def deco(fn):
        def run(*a, **kw):
            try:
                t0 = time.time()
                out = fn(*a, **kw)
                record(name, ok=True, wall_s=round(time.time() - t0, 2), **(out or {}))
                return out
            except Exception as e:  # noqa: BLE001
                import traceback

                traceback.print_exc()
                record(name, ok=False, error=f"{type(e).__name__}: {e}")
                return None

        return run

    return deco


print("initializing jax...", file=sys.stderr, flush=True)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# the axon plugin ignores the JAX_PLATFORMS env var; only the config knob
# reliably forces the platform (CPU shakeouts must NOT touch the tunnel)
if os.environ.get("STPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["STPU_PLATFORM"])

try:
    DEV = jax.devices()[0]
except RuntimeError as e:
    record("init", ok=False, error=str(e))
    sys.exit(2)
if DEV.platform != "cpu":
    # TPU-only: cached CPU AOT executables can load across machine-feature
    # mismatches and silently corrupt results (see CLAUDE.md)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
if DEV.platform == "cpu" and os.environ.get("STPU_ALLOW_CPU") != "1":
    record("init", ok=False, error="no TPU (cpu backend); refusing to measure")
    sys.exit(2)
record("init", ok=True, device=str(DEV), platform=DEV.platform)

sys.path.insert(0, "/root/repo")

from slacken_tpu.classify import (  # noqa: E402
    Classifier,
    ClassifyParams,
    _classify_kernel,
    _classify_kernel_packed,
)
from slacken_tpu.index import KeyValueIndex, _build_batch_kernel  # noqa: E402
from slacken_tpu.ops import encode, lookup as lookup_ops, u64  # noqa: E402
from slacken_tpu.ops.minimizers import window_minimizers  # noqa: E402


def timeit(f, n=5, warmup=2):
    for _ in range(warmup):
        out = f()
        jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = f()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


# ---------------------------------------------------------------------------
@guard("transfer")
def exp_transfer():
    out = {}
    for mb in (1, 4, 16):
        x = np.zeros(mb << 20, np.uint8)
        t, _ = timeit(lambda: jax.device_put(x), n=3, warmup=1)
        out[f"h2d_{mb}MB_MBps"] = round(mb / t, 1)
    y = jnp.zeros(1 << 20, jnp.int32)
    jax.block_until_ready(y)
    t, _ = timeit(lambda: np.asarray(y), n=3, warmup=1)
    out["d2h_4MB_MBps"] = round(4 / t, 1)
    # null-kernel round trip = per-call latency
    f = jax.jit(lambda a: a + 1)
    z = jax.device_put(np.zeros(8, np.int32))
    t, _ = timeit(lambda: f(z), n=10, warmup=2)
    out["dispatch_latency_ms"] = round(t * 1e3, 2)
    # HBM bandwidth: big elementwise op (read+write 256 MB)
    big = jnp.zeros(64 << 20, jnp.float32)
    g = jax.jit(lambda a: a * 1.5 + 1.0)
    jax.block_until_ready(big)
    t, _ = timeit(lambda: g(big), n=3, warmup=2)
    out["hbm_GBps_rw"] = round(2 * 256 / t / 1024, 1)
    return out


IDX = None
CODES_RES = None  # resident [8192, 128] codes


@guard("load_index")
def exp_load_index():
    global IDX, CODES_RES
    cache = "/root/repo/.bench_cache/idx"
    if not os.path.exists(os.path.join(cache, "params.json")):
        # the cache is gitignored and may be wiped between sessions; build
        # it here rather than burning a tunnel window on a FileNotFoundError
        # (r4_session5). Same deterministic library/params as bench.py.
        import importlib.util as _ilu

        from slacken_tpu.index import IndexParams
        from slacken_tpu.taxonomy import Taxonomy

        spec = _ilu.spec_from_file_location("bench", "/root/repo/bench.py")
        bench = _ilu.module_from_spec(spec)
        spec.loader.exec_module(bench)
        nodes = [(1, 1, "root"), (455631, 1, "species"),
                 (526997, 1, "species"), (9606, 1, "species")]
        tax = Taxonomy.from_nodes_and_names(
            nodes, [(t, f"taxon{t}") for t, _, _ in nodes]
        )
        idx = KeyValueIndex.build(
            bench.synthetic_library(np.random.default_rng(20260816)),
            IndexParams(k=35, m=31, spaces=7),
            tax,
            batch_rows=32,
            row_len=1 << 16,
        )
        idx.save(cache)
    IDX = KeyValueIndex.load(cache)
    t0 = time.time()
    jax.block_until_ready((IDX.device_keys.hi, IDX.device_taxa, IDX.device_router))
    up = time.time() - t0
    from slacken_tpu.inputs import packed_reads_from_file

    packed = list(
        packed_reads_from_file("/root/reference/testData/ERR599052_10k.fastq")
    )
    codes = np.concatenate([p.codes for p in packed])[:8192]
    CODES_RES = jax.device_put(codes)
    jax.block_until_ready(CODES_RES)
    return {
        "records": len(IDX.keys),
        "index_upload_s": round(up, 2),
        "router_bits": IDX.router_bits,
        "router_rounds": IDX.router_rounds,
    }


@guard("scan")
def exp_scan():
    mp = IDX.params.minimizer_params
    t_xla, _ = timeit(lambda: window_minimizers(CODES_RES, mp))
    out = {"xla_ms": round(t_xla * 1e3, 2), "xla_Mbp_s": round(8192 * 128 / t_xla / 1e6, 1)}
    try:
        from slacken_tpu.ops.pallas_kernels import window_minimizers_pallas

        t_pl, _ = timeit(lambda: window_minimizers_pallas(CODES_RES, mp))
        out["pallas_ms"] = round(t_pl * 1e3, 2)
        out["pallas_Mbp_s"] = round(8192 * 128 / t_pl / 1e6, 1)
    except Exception as e:  # noqa: BLE001
        out["pallas_error"] = f"{type(e).__name__}: {e}"
    return out


QUERIES = None


@guard("probe")
def exp_probe():
    global QUERIES
    rng = np.random.default_rng(1)
    nq = lookup_ops.span_query_cap(8192 * 128)
    hit = IDX.keys[rng.integers(0, len(IDX.keys), nq // 2)]
    miss = rng.integers(0, 1 << 62, nq - nq // 2).astype(np.uint64)
    q = np.concatenate([hit, miss])
    rng.shuffle(q)
    QUERIES = u64.U64(
        jax.device_put((q >> np.uint64(32)).astype(np.uint32)),
        jax.device_put(q.astype(np.uint32)),
    )
    jax.block_until_ready(QUERIES.hi)
    out = {"n_queries": nq}
    dk, dt = IDX.device_keys, IDX.device_taxa
    t, r_routed = timeit(
        lambda: lookup_ops.lookup_taxa_routed(
            dk, dt, IDX.device_router, QUERIES, IDX.router_rounds, IDX.router_bits
        )
    )
    out["routed_ms"] = round(t * 1e3, 2)
    out["routed_Mq_s"] = round(nq / t / 1e6, 2)
    try:
        bk, bt, maxb = IDX.device_bucketed
        jax.block_until_ready(bk.hi)
        t, r_b = timeit(
            lambda: lookup_ops.lookup_taxa_bucketed(
                bk, bt, IDX.device_router, QUERIES, maxb, IDX.router_bits
            )
        )
        out["bucketed_ms"] = round(t * 1e3, 2)
        out["bucketed_Mq_s"] = round(nq / t / 1e6, 2)
        out["maxb"] = maxb
        out["bucketed_matches_routed"] = bool(
            np.array_equal(np.asarray(r_routed), np.asarray(r_b))
        )
    except Exception as e:  # noqa: BLE001
        out["bucketed_error"] = f"{type(e).__name__}: {e}"
    try:
        from slacken_tpu.ops import pallas_kernels as pk

        kh = (IDX.keys >> np.uint64(32)).astype(np.uint32)
        kl = IDX.keys.astype(np.uint32)
        fh, fl, nb = pk.build_fence(kh, kl)
        args = [jax.device_put(x) for x in (kh, kl, IDX.taxa, fh, fl)]
        jax.block_until_ready(args[0])
        f = jax.jit(
            lambda qh, ql: pk.lookup_taxa_dma(*args, qh, ql)
        )
        t, r_d = timeit(lambda: f(QUERIES.hi, QUERIES.lo))
        out["dma_ms"] = round(t * 1e3, 2)
        out["dma_Mq_s"] = round(nq / t / 1e6, 2)
        out["dma_matches_routed"] = bool(
            np.array_equal(np.asarray(r_routed), np.asarray(r_d))
        )
    except Exception as e:  # noqa: BLE001
        out["dma_error"] = f"{type(e).__name__}: {e}"
    return out


@guard("kernel")
def exp_kernel():
    mp = IDX.params.minimizer_params
    table = jnp.asarray(IDX.taxonomy.rpath_table())
    dk, dt = IDX.device_keys, IDX.device_taxa
    out = {}
    t, _ = timeit(
        lambda: _classify_kernel(
            CODES_RES, dk.hi, dk.lo, dt, IDX.device_router, table, mp, 32,
            IDX.router_rounds, IDX.router_bits,
        )
    )
    out["dense_routed_ms"] = round(t * 1e3, 2)
    out["dense_routed_reads_s"] = round(8192 / t)
    bk, bt, maxb = IDX.device_bucketed
    t, _ = timeit(
        lambda: _classify_kernel(
            CODES_RES, bk.hi, bk.lo, bt, IDX.device_router, table, mp, 32,
            IDX.router_rounds, IDX.router_bits, ("bucketed", maxb),
        )
    )
    out["dense_bucketed_ms"] = round(t * 1e3, 2)
    out["dense_bucketed_reads_s"] = round(8192 / t)

    codes_h = np.asarray(CODES_RES)
    packed, valid = encode.pack_2bit(codes_h)
    pd, vd = jax.device_put(packed), jax.device_put(valid)
    jax.block_until_ready(pd)
    t, _ = timeit(
        lambda: _classify_kernel_packed(
            pd, vd, dk.hi, dk.lo, dt, IDX.device_router, table, mp, 32,
            IDX.router_rounds, IDX.router_bits,
        )
    )
    out["packed_routed_ms"] = round(t * 1e3, 2)

    # component breakdown (jit each stage)
    from slacken_tpu.ops.resolve import INVALID_WINDOW, compact_hits, resolve_hits

    wm = window_minimizers(CODES_RES, mp)
    jax.block_until_ready(wm.minimizer.hi)
    comp = {}
    t, _ = timeit(lambda: window_minimizers(CODES_RES, mp))
    comp["scan_ms"] = round(t * 1e3, 2)
    cap = lookup_ops.span_query_cap(8192 * 128)
    csq = jax.jit(lambda w: lookup_ops.compact_span_queries(w, cap))
    t, (qh, ql, sid, _) = timeit(lambda: csq(wm))
    comp["compact_queries_ms"] = round(t * 1e3, 2)
    probe_f = jax.jit(
        lambda a, b: lookup_ops.lookup_taxa_routed(
            dk, dt, IDX.device_router, u64.U64(a, b), IDX.router_rounds, IDX.router_bits
        )
    )
    t, looked = timeit(lambda: probe_f(qh, ql))
    comp["probe_ms"] = round(t * 1e3, 2)
    scatter_f = jax.jit(
        lambda lk, s, w: jnp.where(
            w.valid, lk[jnp.clip(s, 0, cap - 1)].reshape(8192, 128), INVALID_WINDOW
        ).astype(jnp.int32)
    )
    t, wt = timeit(lambda: scatter_f(looked, sid, wm))
    comp["scatter_ms"] = round(t * 1e3, 2)
    ch_f = jax.jit(lambda w: compact_hits(w, 32))
    t, ch = timeit(lambda: ch_f(wt))
    comp["compact_hits_ms"] = round(t * 1e3, 2)
    rs_f = jax.jit(lambda a, b: resolve_hits(a, b, table))
    t, _ = timeit(lambda: rs_f(ch.taxa, ch.counts))
    comp["resolve_ms"] = round(t * 1e3, 2)
    out["components"] = comp
    return out


@guard("batch_sweep")
def exp_batch_sweep():
    mp = IDX.params.minimizer_params
    table = jnp.asarray(IDX.taxonomy.rpath_table())
    dk, dt = IDX.device_keys, IDX.device_taxa
    codes_h = np.asarray(CODES_RES)
    out = {}
    for b in (2048, 8192, 16384, 32768):
        reps = -(-b // 8192)
        codes = np.concatenate([codes_h] * reps)[:b]
        cd = jax.device_put(codes)
        jax.block_until_ready(cd)
        t, _ = timeit(
            lambda: _classify_kernel(
                cd, dk.hi, dk.lo, dt, IDX.device_router, table, mp, 32,
                IDX.router_rounds, IDX.router_bits,
            ),
            n=3,
        )
        out[f"B{b}_reads_s"] = round(b / t)
    return out


@guard("e2e")
def exp_e2e():
    """The bench.py workload end-to-end (host pipeline + tunnel transfers)."""
    from slacken_tpu import native
    from slacken_tpu.inputs import packed_reads_from_file
    from slacken_tpu.ops import encode as enc

    packed = list(
        packed_reads_from_file("/root/reference/testData/ERR599052_10k.fastq")
    )
    sim_rng = np.random.default_rng(7)
    sizes = {455631: 4_100_000, 526997: 3_100_000, 9606: 800_000}
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    rng = np.random.default_rng(20260816)
    sim = []
    for taxon, n in sizes.items():
        seq = lut[rng.integers(0, 4, n)].tobytes().decode("ascii")
        codes_full = enc.encode_seq(seq)
        starts = sim_rng.integers(0, len(codes_full) - 101, 3334)
        rows = codes_full[starts[:, None] + np.arange(101)[None, :]].astype(np.uint8)
        mut = sim_rng.random(rows.shape) < 0.01
        rows[mut] = sim_rng.integers(0, 4, mut.sum())
        rows = np.pad(rows, ((0, 0), (0, 27)), constant_values=4)
        sim.append(
            native.PackedReads(
                rows,
                np.full(len(rows), 101, np.int32),
                [f"sim{taxon}_{j}" for j in range(len(rows))],
            )
        )
    packed = (packed + sim) * 4
    n_reads = sum(len(p) for p in packed)
    cpar = ClassifyParams(thresholds=[0.0], per_read_output=False)
    out = {"n_reads": n_reads}
    for label, kw in (
        ("dense_routed", dict(probe="routed", packed_transfer=False)),
        ("packed_routed", dict(probe="routed", packed_transfer=True)),
        ("packed_bucketed", dict(probe="bucketed", packed_transfer=True)),
    ):
        cls = Classifier(IDX, target_batch_bp=1 << 20, **kw)
        cls.classify_packed(packed[:2], cpar)  # warm
        best = 0.0
        for _ in range(2):
            t0 = time.time()
            res = cls.classify_packed(packed, cpar)[0.0]
            best = max(best, n_reads / (time.time() - t0))
        out[f"{label}_reads_s"] = round(best)
        out.setdefault("n_classified", sum(1 for r in res if r.classified))
    # bigger batches over the tunnel
    for bp in (1 << 22,):
        cls = Classifier(
            IDX, target_batch_bp=bp, probe="bucketed", packed_transfer=True
        )
        cls.classify_packed(packed[:2], cpar)
        t0 = time.time()
        cls.classify_packed(packed, cpar)
        out[f"packed_bucketed_bp{bp >> 20}M_reads_s"] = round(
            n_reads / (time.time() - t0)
        )
    return out


@guard("bracken")
def exp_bracken():
    from slacken_tpu.bracken import BrackenWeights, _window_classify_kernel
    from slacken_tpu.bracken import _fragment_kernel

    mp = IDX.params.minimizer_params
    dk = IDX.device_keys
    table = jnp.asarray(IDX.taxonomy.rpath_table())
    # one 64 KB fragment per genome-ish row
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, size=(16, 1 << 16)).astype(np.uint8)
    cd = jax.device_put(codes)
    looked, valid, span_start, distinct = _fragment_kernel(
        cd, dk.hi, dk.lo, IDX.device_taxa, IDX.device_router, mp,
        IDX.router_rounds, IDX.router_bits,
    )
    jax.block_until_ready(looked)
    R, k = 100, IDX.params.k
    t, (dest, ovf) = timeit(
        lambda: _window_classify_kernel(
            looked, valid, span_start, distinct, table, R, k, 64
        ),
        n=3,
    )
    n_windows = 16 * ((1 << 16) - R + 1)
    out = {
        "device_ms": round(t * 1e3, 1),
        "device_Mwin_s": round(n_windows / t / 1e6, 2),
        "overflow_rows": int(np.asarray(ovf).sum()),
    }
    # numpy path on the same data
    bw = BrackenWeights(IDX, R)
    lh, vh, sh, dh = (np.asarray(x) for x in (looked, valid, span_start, distinct))
    t0 = time.time()
    for row in range(4):
        bw._fragment_dest_counts(lh[row], vh[row], sh[row], dh[row], 1 << 16)
    t_np = (time.time() - t0) / 4 * 16
    out["numpy_ms_equiv"] = round(t_np * 1e3, 1)
    out["numpy_Mwin_s"] = round(n_windows / t_np / 1e6, 2)
    return out


@guard("build")
def exp_build():
    mp = IDX.params.minimizer_params
    rng = np.random.default_rng(5)
    codes = rng.integers(0, 4, size=(64, 1 << 14)).astype(np.uint8)
    taxa_rows = rng.integers(1, 100, 64).astype(np.int32)
    cd = jax.device_put(codes)
    cap = (64 * (1 << 14)) // 2
    t, _ = timeit(lambda: _build_batch_kernel(cd, taxa_rows, mp, cap), n=3)
    return {
        "device_ms": round(t * 1e3, 1),
        "Mbp_s": round(64 * (1 << 14) / t / 1e6, 1),
    }


# ---------------------------------------------------------------------------
# Round-2 additions: dispatch-latency-corrected on-device-loop measurements.
#
# Every per-call timing above includes the axon tunnel's ~30 ms dispatch
# latency, which swamps any kernel faster than that (the round-1 "HBM
# 17.2 GB/s" was pure latency). These experiments run R iterations inside one
# lax.fori_loop with a data dependency between iterations (so XLA cannot
# hoist the work), subtract the measured null-dispatch latency, and divide.
# ---------------------------------------------------------------------------

LAT_S = 0.0


def ensure_latency():
    """Measure null-dispatch latency once (timeit_loop subtracts it)."""
    global LAT_S
    if LAT_S == 0.0:
        f = jax.jit(lambda a: a + 1)
        z = jax.device_put(np.zeros(8, np.int32))
        t, _ = timeit(lambda: f(z), n=10, warmup=2)
        LAT_S = t


def timeit_loop(step, init, R=16, n=3):
    """Time one iteration of `step` (carry -> carry) amortized over an
    R-iteration on-device fori_loop; subtracts null-dispatch latency."""
    ensure_latency()
    body = jax.jit(lambda c: jax.lax.fori_loop(0, R, step, c))
    jax.block_until_ready(body(init))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(body(init))
        ts.append(time.perf_counter() - t0)
    return max(1e-9, (min(ts) - LAT_S) / R)


@guard("roofline")
def exp_roofline():
    out = {}
    ensure_latency()
    out["dispatch_latency_ms"] = round(LAT_S * 1e3, 2)

    # Data is generated on device with a multiply-hash over iota — NOT
    # jax.random: the 1 GB threefry generation program crashed the tunnel's
    # compile helper twice (sessions 2 and 3, "Broken pipe" at
    # remote_compile), and a knuth-hash compiles to a handful of vector ops.
    # Each sub-measurement is individually guarded so one failure still
    # leaves the rest recorded.
    def hashu(shape, salt):
        n = int(np.prod(shape))
        i = jax.lax.iota(jnp.uint32, n) + jnp.uint32(salt)
        h = (i * jnp.uint32(2654435761)) ^ (i >> 15)
        return (h * jnp.uint32(0x9E3779B1)).reshape(shape)

    # true HBM bandwidth: non-distributive max against the varying carry so
    # XLA can neither hoist nor fold; 512 MB of mandatory reads per step.
    try:
        mats = jax.jit(lambda: (hashu((8, 16 << 20), 1) >> 8).astype(jnp.float32))()
        jax.block_until_ready(mats)
        c0 = jnp.zeros(16 << 20, jnp.float32)
        per = timeit_loop(
            lambda i, c: jnp.maximum(mats, c[None, :] * 0.999).sum(0) * 0.124, c0, R=8
        )
        out["hbm_GBps_read"] = round((8 * 64 + 2 * 64) / per / 1024, 1)
        del mats
    except Exception as e:  # noqa: BLE001
        out["hbm_error"] = f"{type(e).__name__}: {e}"[:300]

    # element-gather rate: pointer-chase permutation, 1M parallel chains
    n = 1 << 22  # 4M-entry i32 table (16 MB), ~index scale
    try:
        perm = jax.jit(
            lambda: jnp.argsort(hashu((n,), 2)).astype(jnp.int32)
        )()
        c0 = jax.jit(lambda: (hashu((1 << 20,), 3) % n).astype(jnp.int32))()
        jax.block_until_ready((perm, c0))
        per = timeit_loop(lambda i, c: perm[c], c0, R=16)
        out["elem_gather_M_s"] = round((1 << 20) / per / 1e6, 1)
    except Exception as e:  # noqa: BLE001
        out["elem_gather_error"] = f"{type(e).__name__}: {e}"[:300]

    # row-gather rate: same chase but each hop fetches a contiguous
    # 16-lane row (the tiled-probe access shape, 64 B/row)
    try:
        rows = jax.jit(
            lambda: jnp.tile(
                jnp.argsort(hashu((n // 16,), 4)).astype(jnp.int32)[:, None], (1, 16)
            )
        )()
        c1 = jax.jit(lambda: (hashu((1 << 20,), 5) % (n // 16)).astype(jnp.int32))()
        jax.block_until_ready((rows, c1))
        per = timeit_loop(lambda i, c: rows[c][:, 0], c1, R=16)
        out["row_gather_M_s"] = round((1 << 20) / per / 1e6, 1)
        out["row_gather_GBps"] = round((1 << 20) * 64 / per / (1 << 30), 1)
    except Exception as e:  # noqa: BLE001
        out["row_gather_error"] = f"{type(e).__name__}: {e}"[:300]

    # wider row gather: 48-lane rows = one tiled-probe row (tile*3 u32)
    try:
        rows = jax.jit(
            lambda: jnp.tile(
                jnp.argsort(hashu((n // 48, ), 6)).astype(jnp.int32)[:, None], (1, 48)
            )
        )()
        c2 = jax.jit(lambda: (hashu((1 << 20,), 7) % (n // 48)).astype(jnp.int32))()
        jax.block_until_ready((rows, c2))
        per = timeit_loop(lambda i, c: rows[c][:, 0], c2, R=16)
        out["row48_gather_M_s"] = round((1 << 20) / per / 1e6, 1)
        out["row48_gather_GBps"] = round((1 << 20) * 192 / per / (1 << 30), 1)
    except Exception as e:  # noqa: BLE001
        out["row48_gather_error"] = f"{type(e).__name__}: {e}"[:300]
    return out


def ensure_index():
    """Load the index/codes if the load_index experiment was not selected
    (each experiment must be runnable standalone after a tunnel recovery)."""
    if IDX is None:
        exp_load_index()


def ensure_queries():
    global QUERIES
    if QUERIES is not None:
        return
    ensure_index()
    rng = np.random.default_rng(1)
    nq = lookup_ops.span_query_cap(8192 * 128)
    hit = IDX.keys[rng.integers(0, len(IDX.keys), nq // 2)]
    miss = rng.integers(0, 1 << 62, nq - nq // 2).astype(np.uint64)
    q = np.concatenate([hit, miss])
    rng.shuffle(q)
    QUERIES = u64.U64(
        jax.device_put((q >> np.uint64(32)).astype(np.uint32)),
        jax.device_put(q.astype(np.uint32)),
    )
    jax.block_until_ready(QUERIES.hi)


@guard("probe2")
def exp_probe2():
    """Probe variants, latency-corrected, with an iteration-to-iteration
    data dependency (query lo-bit perturbed by the previous result)."""
    ensure_queries()
    nq = lookup_ops.span_query_cap(8192 * 128)
    out = {"n_queries": nq}
    qh, ql = QUERIES.hi, QUERIES.lo
    dk, dt = IDX.device_keys, IDX.device_taxa
    router = IDX.device_router

    def dep(c):
        return (c & 1).astype(jnp.uint32)

    def routed_step(i, c):
        r = lookup_ops.lookup_taxa_routed(
            dk, dt, router, u64.U64(qh, ql ^ dep(c)), IDX.router_rounds, IDX.router_bits
        )
        return r.sum()

    per = timeit_loop(routed_step, jnp.int32(0), R=8)
    out["routed_ms"] = round(per * 1e3, 2)
    out["routed_Mq_s"] = round(nq / per / 1e6, 2)

    table, tile = IDX.device_tiled
    jax.block_until_ready(table)
    out["tile"] = tile
    out["tiled_table_MB"] = round(table.nbytes / 1e6, 1)

    def tiled_step(i, c):
        r = lookup_ops.lookup_taxa_tiled(
            table, router, u64.U64(qh, ql ^ dep(c)), tile, IDX.router_bits
        )
        return r.sum()

    per = timeit_loop(tiled_step, jnp.int32(0), R=8)
    out["tiled_ms"] = round(per * 1e3, 2)
    out["tiled_Mq_s"] = round(nq / per / 1e6, 2)

    r_routed = lookup_ops.lookup_taxa_routed(
        dk, dt, router, QUERIES, IDX.router_rounds, IDX.router_bits
    )
    r_tiled = lookup_ops.lookup_taxa_tiled(table, router, QUERIES, tile, IDX.router_bits)
    out["tiled_matches_routed"] = bool(
        np.array_equal(np.asarray(r_routed), np.asarray(r_tiled))
    )
    return out


@guard("kernel2")
def exp_kernel2():
    """Fused classify kernel, latency-corrected, routed vs tiled probe,
    B=8192 and B=32768."""
    ensure_index()
    mp = IDX.params.minimizer_params
    table_tax = jnp.asarray(IDX.taxonomy.rpath_table())
    dk, dt = IDX.device_keys, IDX.device_taxa
    router = IDX.device_router
    ttab, tile = IDX.device_tiled
    out = {"tile": tile}
    codes_h = np.asarray(CODES_RES)

    from slacken_tpu.classify import _classify_kernel_tiled

    for b in (8192, 32768):
        reps = -(-b // 8192)
        cd = jax.device_put(np.concatenate([codes_h] * reps)[:b])
        jax.block_until_ready(cd)

        def routed_step(i, c, cd=cd):
            cc = cd.at[0, 0].set((c & 3).astype(jnp.uint8))
            wt, nd, ch, res, hp = _classify_kernel(
                cc, dk.hi, dk.lo, dt, router, table_tax, mp, 32,
                IDX.router_rounds, IDX.router_bits,
            )
            return res.max_taxon.sum()

        per = timeit_loop(routed_step, jnp.int32(0), R=4)
        out[f"B{b}_routed_ms"] = round(per * 1e3, 1)
        out[f"B{b}_routed_reads_s"] = round(b / per)

        def tiled_step(i, c, cd=cd):
            cc = cd.at[0, 0].set((c & 3).astype(jnp.uint8))
            wt, nd, ch, res, hp = _classify_kernel_tiled(
                cc, ttab, router, table_tax, mp, 32, IDX.router_bits,
                ("tiled", tile, False),
            )
            return res.max_taxon.sum()

        per = timeit_loop(tiled_step, jnp.int32(0), R=4)
        out[f"B{b}_tiled_ms"] = round(per * 1e3, 1)
        out[f"B{b}_tiled_reads_s"] = round(b / per)

        def tiled_dense_step(i, c, cd=cd):
            cc = cd.at[0, 0].set((c & 3).astype(jnp.uint8))
            wt, nd, ch, res, hp = _classify_kernel_tiled(
                cc, ttab, router, table_tax, mp, 32, IDX.router_bits,
                ("tiled", tile, True),
            )
            return res.max_taxon.sum()

        per = timeit_loop(tiled_dense_step, jnp.int32(0), R=4)
        out[f"B{b}_tiled_dense_ms"] = round(per * 1e3, 1)
        out[f"B{b}_tiled_dense_reads_s"] = round(b / per)

        htab, htile, hbits = IDX.device_hashed
        jax.block_until_ready(htab)

        def hashed_dense_step(i, c, cd=cd):
            cc = cd.at[0, 0].set((c & 3).astype(jnp.uint8))
            wt, nd, ch, res, hp = _classify_kernel_tiled(
                cc, htab, router, table_tax, mp, 32, 0,
                ("hashed", htile, hbits, True),
            )
            return res.max_taxon.sum()

        per = timeit_loop(hashed_dense_step, jnp.int32(0), R=4)
        out[f"B{b}_hashed_dense_ms"] = round(per * 1e3, 1)
        out[f"B{b}_hashed_dense_reads_s"] = round(b / per)
    return out


@guard("components2")
def exp_components2():
    """Latency-corrected component breakdown at B=8192 (scan / compact /
    probe / scatter / compact_hits / resolve)."""
    ensure_index()
    from slacken_tpu.ops.resolve import INVALID_WINDOW, compact_hits, resolve_hits

    mp = IDX.params.minimizer_params
    table_tax = jnp.asarray(IDX.taxonomy.rpath_table())
    out = {}

    def scan_step(i, c):
        cc = CODES_RES.at[0, 0].set((c & 3).astype(jnp.uint8))
        wm = window_minimizers(cc, mp)
        # reduce over EVERY output so XLA cannot dead-code-eliminate the
        # bulk of the scan (a [0, 0] carry lets it slice the whole batch
        # away — the round-3 "9.1 Gbp/s" was that artifact)
        return (
            wm.minimizer.lo.sum().astype(jnp.int32)
            + wm.valid.sum().astype(jnp.int32)
            + wm.span_start.sum().astype(jnp.int32)
            + wm.distinct.sum().astype(jnp.int32)
        )

    per = timeit_loop(scan_step, jnp.int32(0), R=8)
    out["scan_ms"] = round(per * 1e3, 2)
    out["scan_Mbp_s"] = round(8192 * 128 / per / 1e6, 1)

    try:
        from slacken_tpu.ops.pallas_kernels import window_minimizers_pallas

        def pscan_step(i, c):
            cc = CODES_RES.at[0, 0].set((c & 3).astype(jnp.uint8))
            wm = window_minimizers_pallas(cc, mp)
            return (
                wm.minimizer.lo.sum().astype(jnp.int32)
                + wm.valid.sum().astype(jnp.int32)
                + wm.span_start.sum().astype(jnp.int32)
                + wm.distinct.sum().astype(jnp.int32)
            )

        per = timeit_loop(pscan_step, jnp.int32(0), R=8)
        out["pallas_scan_ms"] = round(per * 1e3, 2)
        out["pallas_scan_Mbp_s"] = round(8192 * 128 / per / 1e6, 1)
    except Exception as e:  # noqa: BLE001
        out["pallas_scan_error"] = f"{type(e).__name__}: {e}"[:300]

    wm0 = window_minimizers(CODES_RES, mp)
    jax.block_until_ready(wm0.minimizer.hi)
    cap = lookup_ops.span_query_cap(8192 * 128)

    def resolve_step(i, c):
        wt = jnp.where(
            wm0.valid, (c % 7).astype(jnp.int32), INVALID_WINDOW
        ).astype(jnp.int32)
        ch = compact_hits(wt, 32)
        res = resolve_hits(ch.taxa, ch.counts, table_tax)
        return res.max_taxon.sum()

    per = timeit_loop(resolve_step, jnp.int32(0), R=8)
    out["compact_resolve_ms"] = round(per * 1e3, 2)
    return out


@guard("components3")
def exp_components3():
    """Split the compact+resolve cost: sort-based vs rounds-based compaction
    and the resolve core, each latency-corrected at B=8192."""
    ensure_index()
    from slacken_tpu.ops.resolve import (
        INVALID_WINDOW,
        compact_hits_rounds,
        compact_hits_sort,
        resolve_hits,
    )

    mp = IDX.params.minimizer_params
    table_tax = jnp.asarray(IDX.taxonomy.rpath_table())
    out = {}

    # realistic window taxa from the resident reads
    wm = window_minimizers(CODES_RES, mp)
    dk, dt = IDX.device_keys, IDX.device_taxa
    looked = lookup_ops.lookup_taxa_routed(
        dk, dt, IDX.device_router, wm.minimizer, IDX.router_rounds, IDX.router_bits
    )
    wt0 = jnp.where(wm.valid, looked, INVALID_WINDOW).astype(jnp.int32)
    jax.block_until_ready(wt0)

    def mk_step(fn):
        def step(i, c):
            wt = wt0.at[0, 0].set(c)
            ch = fn(wt, 32)
            return ch.counts.sum() + ch.taxa.sum()
        return step

    per = timeit_loop(mk_step(compact_hits_sort), jnp.int32(0), R=8)
    out["compact_sort_ms"] = round(per * 1e3, 2)
    per = timeit_loop(mk_step(compact_hits_rounds), jnp.int32(0), R=8)
    out["compact_rounds_ms"] = round(per * 1e3, 2)

    ch0 = compact_hits_rounds(wt0, 32)
    jax.block_until_ready(ch0.taxa)

    def resolve_step(i, c):
        res = resolve_hits(ch0.taxa.at[0, 0].set(c), ch0.counts, table_tax)
        return res.max_taxon.sum() + res.clade.sum()

    per = timeit_loop(resolve_step, jnp.int32(0), R=8)
    out["resolve_ms"] = round(per * 1e3, 2)

    # span-query compaction (cumsum + scatter into the compact buffer) and
    # the scatter-back gather — the two remaining data-movement stages
    cap = lookup_ops.span_query_cap(8192 * 128)

    def cq_step(i, c):
        wm2 = wm._replace(
            span_start=wm.span_start.at[0, 0].set((c & 1) != 0)
        )
        qh, ql, sid, n_spans = lookup_ops.compact_span_queries(wm2, cap)
        return (qh.sum() + ql.sum()).astype(jnp.int32) + n_spans

    per = timeit_loop(cq_step, jnp.int32(0), R=8)
    out["compact_queries_ms"] = round(per * 1e3, 2)

    qh0, ql0, sid0, _ = lookup_ops.compact_span_queries(wm, cap)
    looked0 = lookup_ops.lookup_taxa_routed(
        dk, dt, IDX.device_router, u64.U64(qh0, ql0), IDX.router_rounds, IDX.router_bits
    )
    jax.block_until_ready(looked0)

    def sb_step(i, c):
        lk = looked0.at[0].set(c)
        wt = jnp.where(
            wm.valid, lk[jnp.clip(sid0, 0, cap - 1)].reshape(8192, 128), INVALID_WINDOW
        ).astype(jnp.int32)
        return wt.sum()

    per = timeit_loop(sb_step, jnp.int32(0), R=8)
    out["scatter_back_ms"] = round(per * 1e3, 2)
    return out


@guard("components4")
def exp_components4():
    """Stage split of the dense-tiled kernel at the production batch size
    (B=32768): find where kernel2's unexplained time goes (stage sums were
    ~2x below the measured whole-kernel time at this size)."""
    ensure_index()
    from slacken_tpu.ops.resolve import (
        INVALID_WINDOW,
        compact_hits_rounds,
        resolve_hits,
    )

    mp = IDX.params.minimizer_params
    table_tax = jnp.asarray(IDX.taxonomy.rpath_table())
    ttab, tile = IDX.device_tiled
    router = IDX.device_router
    out = {"B": 32768}
    codes_h = np.asarray(CODES_RES)
    cd = jax.device_put(np.concatenate([codes_h] * 4))
    jax.block_until_ready((cd, ttab))

    def scan_step(i, c):
        cc = cd.at[0, 0].set((c & 3).astype(jnp.uint8))
        wm = window_minimizers(cc, mp)
        return (
            wm.minimizer.lo.sum().astype(jnp.int32)
            + wm.valid.sum().astype(jnp.int32)
            + wm.span_start.sum().astype(jnp.int32)
            + wm.distinct.sum().astype(jnp.int32)
        )

    per = timeit_loop(scan_step, jnp.int32(0), R=4)
    out["scan_ms"] = round(per * 1e3, 2)

    wm0 = window_minimizers(cd, mp)
    jax.block_until_ready(wm0.minimizer.hi)

    def probe_step(i, c):
        q = u64.U64(wm0.minimizer.hi, wm0.minimizer.lo ^ (c & 1).astype(jnp.uint32))
        r = lookup_ops.lookup_taxa_tiled(ttab, router, q, tile, IDX.router_bits)
        return r.sum()

    per = timeit_loop(probe_step, jnp.int32(0), R=4)
    out["probe_dense_ms"] = round(per * 1e3, 2)

    looked0 = lookup_ops.lookup_taxa_tiled(
        ttab, router, wm0.minimizer, tile, IDX.router_bits
    )
    jax.block_until_ready(looked0)

    def mask_nd_step(i, c):
        lk = looked0.at[0, 0].set(c)
        wt = jnp.where(wm0.valid, lk, INVALID_WINDOW).astype(jnp.int32)
        nd = jnp.sum(
            wm0.span_start & wm0.distinct & (lk > 0) & wm0.valid, axis=-1
        ).astype(jnp.int32)
        return wt.sum() + nd.sum()

    per = timeit_loop(mask_nd_step, jnp.int32(0), R=4)
    out["mask_nd_ms"] = round(per * 1e3, 2)

    wt0 = jnp.where(wm0.valid, looked0, INVALID_WINDOW).astype(jnp.int32)
    jax.block_until_ready(wt0)

    def compact_step(i, c):
        ch = compact_hits_rounds(wt0.at[0, 0].set(c), 32)
        return ch.counts.sum() + ch.taxa.sum()

    per = timeit_loop(compact_step, jnp.int32(0), R=4)
    out["compact_rounds_ms"] = round(per * 1e3, 2)

    ch0 = compact_hits_rounds(wt0, 32)
    jax.block_until_ready(ch0.taxa)

    def resolve_step(i, c):
        res = resolve_hits(ch0.taxa.at[0, 0].set(c), ch0.counts, table_tax)
        return res.max_taxon.sum() + res.clade.sum()

    per = timeit_loop(resolve_step, jnp.int32(0), R=4)
    out["resolve_ms"] = round(per * 1e3, 2)

    # the packed-transfer unpack stage (what e2e actually runs)
    packed, valid = encode.pack_2bit(codes_h)
    pd = jax.device_put(np.concatenate([packed] * 4))
    vd = jax.device_put(np.concatenate([valid] * 4))
    jax.block_until_ready((pd, vd))

    def unpack_step(i, c):
        codes = encode.unpack_2bit_device(pd.at[0, 0].set(c.astype(pd.dtype)), vd)
        return codes.astype(jnp.int32).sum()

    per = timeit_loop(unpack_step, jnp.int32(0), R=4)
    out["unpack_ms"] = round(per * 1e3, 2)

    # true d2h: fetch a FRESH 16 MB device array (the detailed-mode
    # window_taxa transfer) — content varies per run so nothing caches
    bump = jax.jit(lambda a, c: a + c)
    wt_dev = jnp.zeros((32768, 128), jnp.int32)
    jax.block_until_ready(wt_dev)
    ts = []
    for r in range(4):
        wt_dev = bump(wt_dev, jnp.int32(r + 1))
        jax.block_until_ready(wt_dev)
        t0 = time.perf_counter()
        np.asarray(wt_dev)
        ts.append(time.perf_counter() - t0)
    out["d2h_16MB_ms"] = round(min(ts) * 1e3, 1)
    out["d2h_MBps"] = round(16 / min(ts), 1)
    return out


@guard("pallas_probe")
def exp_pallas_probe():
    """Micro-kernels isolating which mask idiom Mosaic rejects (the scan
    kernel dies on an i1->i32 tpu.bitcast_vreg even after switching the
    outputs to selects)."""
    from jax.experimental import pallas as pl

    out = {}
    x0 = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)

    def trial(name, body):
        try:
            f = pl.pallas_call(
                body, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32)
            )
            r = jax.jit(f)(x0)
            jax.block_until_ready(r)
            out[name] = "ok"
        except Exception as e:  # noqa: BLE001
            msg = f"{type(e).__name__}: {e}"
            key = [l for l in msg.split("\n") if "Mosaic failed" in l or "NotImplemented" in l]
            out[name] = (key[0] if key else msg)[:160]

    def k_select(x_ref, o_ref):
        m = x_ref[:] > 64
        o_ref[:] = jnp.where(m, jnp.int32(1), jnp.int32(0))

    def k_astype(x_ref, o_ref):
        o_ref[:] = (x_ref[:] > 64).astype(jnp.int32)

    def k_concat(x_ref, o_ref):
        m = x_ref[:] > 64
        z = jnp.zeros((8, 1), bool)
        m2 = jnp.concatenate([m[:, 1:], z], axis=-1)
        o_ref[:] = jnp.where(m & m2, jnp.int32(1), jnp.int32(0))

    def k_carry(x_ref, o_ref):
        # the _carry_forward idiom: where on values + or on masks
        m = x_ref[:] > 64
        v = x_ref[:]
        z = jnp.zeros((8, 16), x_ref.dtype)
        zb = jnp.zeros((8, 16), bool)
        pv = jnp.concatenate([z, v[:, :-16]], axis=-1)
        pm = jnp.concatenate([zb, m[:, :-16]], axis=-1)
        take = (~m) & pm
        o_ref[:] = jnp.where(take, pv, v)

    def k_sum_bool(x_ref, o_ref):
        m = x_ref[:] > 64
        s = jnp.sum(jnp.where(m, 1, 0))
        o_ref[:] = x_ref[:] + s

    trial("select", k_select)
    trial("astype", k_astype)
    trial("concat", k_concat)
    trial("carry", k_carry)
    trial("sum_bool", k_sum_bool)
    return out


@guard("bench2")
def exp_bench2():
    """Exactly the driver bench workload (bench.py): reports-path
    classify_and_write_packed + a fresh 2 Mbp build, on this device."""
    import shutil
    import tempfile

    ensure_index()
    from slacken_tpu import native
    from slacken_tpu.index import IndexParams
    from slacken_tpu.inputs import packed_reads_from_file
    from slacken_tpu.ops import encode as enc
    from slacken_tpu.taxonomy import Taxonomy

    packed = list(
        packed_reads_from_file("/root/reference/testData/ERR599052_10k.fastq")
    )
    sim_rng = np.random.default_rng(7)
    sizes = {455631: 4_100_000, 526997: 3_100_000, 9606: 800_000}
    lutb = np.frombuffer(b"ACGT", dtype=np.uint8)
    rng = np.random.default_rng(20260816)
    sim = []
    for taxon, n in sizes.items():
        seq = lutb[rng.integers(0, 4, n)].tobytes().decode("ascii")
        cf = enc.encode_seq(seq)
        st = sim_rng.integers(0, len(cf) - 101, 3334)
        rows = cf[st[:, None] + np.arange(101)[None, :]].astype(np.uint8)
        mut = sim_rng.random(rows.shape) < 0.01
        rows[mut] = sim_rng.integers(0, 4, mut.sum())
        rows = np.pad(rows, ((0, 0), (0, 27)), constant_values=4)
        sim.append(
            native.PackedReads(
                rows, np.full(len(rows), 101, np.int32),
                [f"sim{taxon}_{j}" for j in range(len(rows))],
            )
        )
    packed = (packed + sim) * 4
    n_reads = sum(len(p) for p in packed)
    out = {"n_reads": n_reads}
    cpar = ClassifyParams(thresholds=[0.0], per_read_output=False)
    cls = Classifier(IDX, target_batch_bp=1 << 22)
    outdir = tempfile.mkdtemp(prefix="stpu_bench2_")
    try:
        cls.classify_and_write_packed(packed[:1], outdir + "/warm", cpar)
        best = 0.0
        for t in range(3):
            t0 = time.time()
            cls.classify_and_write_packed(packed, outdir + f"/t{t}", cpar)
            best = max(best, n_reads / (time.time() - t0))
        out["classify_write_reads_s"] = round(best)
    finally:
        shutil.rmtree(outdir, ignore_errors=True)

    def build_library(rng2):
        for taxon, n in sizes.items():
            yield taxon, lutb[rng2.integers(0, 4, n)].tobytes().decode("ascii")

    nodes = [(1, 1, "root"), (455631, 1, "species"), (526997, 1, "species"), (9606, 1, "species")]
    tax = Taxonomy.from_nodes_and_names(nodes, [(t, f"taxon{t}") for t, _, _ in nodes])
    KeyValueIndex.build(  # compile
        [(9606, "ACGT" * 100)], IndexParams(k=35, m=31, spaces=7), tax,
        batch_rows=32, row_len=1 << 16,
    )
    t0 = time.time()
    bidx = KeyValueIndex.build(
        build_library(np.random.default_rng(20260816)),
        IndexParams(k=35, m=31, spaces=7), tax, batch_rows=32, row_len=1 << 16,
    )
    dt = time.time() - t0
    out["build_records"] = len(bidx.keys)
    out["build_mbp_s"] = round(8.0 / dt, 2)
    return out


def _e2e_reads():
    """10k real + 10k simulated reads, 4x replicated (the bench workload)."""
    from slacken_tpu import native
    from slacken_tpu.inputs import packed_reads_from_file
    from slacken_tpu.ops import encode as enc

    packed = list(
        packed_reads_from_file("/root/reference/testData/ERR599052_10k.fastq")
    )
    sim_rng = np.random.default_rng(7)
    sizes = {455631: 4_100_000, 526997: 3_100_000, 9606: 800_000}
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    rng = np.random.default_rng(20260816)
    sim = []
    for taxon, n in sizes.items():
        seq = lut[rng.integers(0, 4, n)].tobytes().decode("ascii")
        codes_full = enc.encode_seq(seq)
        starts = sim_rng.integers(0, len(codes_full) - 101, 3334)
        rows = codes_full[starts[:, None] + np.arange(101)[None, :]].astype(np.uint8)
        mut = sim_rng.random(rows.shape) < 0.01
        rows[mut] = sim_rng.integers(0, 4, mut.sum())
        rows = np.pad(rows, ((0, 0), (0, 27)), constant_values=4)
        sim.append(
            native.PackedReads(
                rows,
                np.full(len(rows), 101, np.int32),
                [f"sim{taxon}_{j}" for j in range(len(rows))],
            )
        )
    packed = (packed + sim) * 4
    return packed, sum(len(p) for p in packed)


@guard("e2e2")
def exp_e2e2():
    """Host pipeline e2e with the tiled probe and bigger batches."""
    ensure_index()
    packed, n_reads = _e2e_reads()
    cpar = ClassifyParams(thresholds=[0.0], per_read_output=False)
    out = {"n_reads": n_reads}
    for label, bp, kw in (
        ("tiled_1M", 1 << 20, dict(probe="tiled", packed_transfer=True)),
        ("tiled_4M", 1 << 22, dict(probe="tiled", packed_transfer=True)),
        ("tiled_8M", 1 << 23, dict(probe="tiled", packed_transfer=True)),
        ("routed_4M", 1 << 22, dict(probe="routed", packed_transfer=True)),
    ):
        cls = Classifier(IDX, target_batch_bp=bp, **kw)
        cls.classify_packed(packed[:2], cpar)  # warm
        best = 0.0
        for _ in range(2):
            t0 = time.time()
            res = cls.classify_packed(packed, cpar)[0.0]
            best = max(best, n_reads / (time.time() - t0))
        out[f"{label}_reads_s"] = round(best)
        out.setdefault("n_classified", sum(1 for r in res if r.classified))

    # detailed per-read output + gzip writing at TPU speed (VERDICT weak #9:
    # detailed mode should stay within ~10% of reports-only throughput)
    import shutil
    import tempfile

    dpar = ClassifyParams(thresholds=[0.0], per_read_output=True)
    cls = Classifier(IDX, target_batch_bp=1 << 22, probe="tiled", packed_transfer=True)
    loc = tempfile.mkdtemp(prefix="stpu_e2e_")
    try:
        cls.classify_and_write_packed(packed[:2], loc + "/warm", dpar)
        t0 = time.time()
        cls.classify_and_write_packed(packed, loc + "/run", dpar)
        out["tiled_4M_detailed_reads_s"] = round(n_reads / (time.time() - t0))
    finally:
        shutil.rmtree(loc, ignore_errors=True)
    return out


@guard("e2e3")
def exp_e2e3():
    """Round-2 late additions: the routerless hashed probe e2e, and detailed
    mode with the device-RLE window-taxa transfer (on vs off)."""
    import os
    import shutil
    import tempfile

    ensure_index()
    packed, n_reads = _e2e_reads()
    out = {"n_reads": n_reads}
    cpar = ClassifyParams(thresholds=[0.0], per_read_output=False)
    for label, kw in (
        ("hashed_4M", dict(probe="hashed", packed_transfer=True)),
        ("tiled_4M", dict(probe="tiled", packed_transfer=True)),
    ):
        cls = Classifier(IDX, target_batch_bp=1 << 22, **kw)
        cls.classify_packed(packed[:2], cpar)  # warm
        best = 0.0
        for _ in range(2):
            t0 = time.time()
            cls.classify_packed(packed, cpar)
            best = max(best, n_reads / (time.time() - t0))
        out[f"{label}_reads_s"] = round(best)

    dpar = ClassifyParams(thresholds=[0.0], per_read_output=True)
    for label, rle_flag in (("rle", "1"), ("dense", "0")):
        os.environ["STPU_WT_RLE"] = rle_flag
        cls = Classifier(
            IDX, target_batch_bp=1 << 22, probe="tiled", packed_transfer=True
        )
        loc = tempfile.mkdtemp(prefix="stpu_e2e3_")
        try:
            cls.classify_and_write_packed(packed[:2], loc + "/warm", dpar)
            t0 = time.time()
            cls.classify_and_write_packed(packed, loc + "/run", dpar)
            out[f"detailed_{label}_reads_s"] = round(n_reads / (time.time() - t0))
        finally:
            shutil.rmtree(loc, ignore_errors=True)
    os.environ.pop("STPU_WT_RLE", None)
    return out


@guard("probe3")
def exp_probe3():
    """Pure lookup throughput of the single-gather hashed probe (tile16
    auto-bits and tile32 bits-1 variants) vs the tiled probe."""
    ensure_queries()
    nq = lookup_ops.span_query_cap(8192 * 128)
    out = {"n_queries": nq}
    qh, ql = QUERIES.hi, QUERIES.lo
    router = IDX.device_router
    table, tile = IDX.device_tiled
    jax.block_until_ready(table)

    def dep(c):
        return (c & 1).astype(jnp.uint32)

    def tiled_step(i, c):
        r = lookup_ops.lookup_taxa_tiled(
            table, router, u64.U64(qh, ql ^ dep(c)), tile, IDX.router_bits
        )
        return r.sum()

    per = timeit_loop(tiled_step, jnp.int32(0), R=8)
    out["tiled_Mq_s"] = round(nq / per / 1e6, 2)

    r_tiled = lookup_ops.lookup_taxa_tiled(table, router, QUERIES, tile, IDX.router_bits)
    auto = lookup_ops.build_hashed(IDX.keys, IDX.taxa, IDX.key_bits)
    # one fewer hash bit: half the slots/memory, double the fetch width
    low = lookup_ops.build_hashed(IDX.keys, IDX.taxa, IDX.key_bits, bits=auto[2] - 1)
    for label, (htab, htile, hbits) in (("t16", auto), ("t32", low)):
        htab = jnp.asarray(htab)
        jax.block_until_ready(htab)
        out[f"hashed_{label}_tile"] = htile
        out[f"hashed_{label}_bits"] = hbits
        out[f"hashed_{label}_MB"] = round(htab.nbytes / 1e6, 1)

        def hashed_step(i, c, htab=htab, htile=htile, hbits=hbits):
            r = lookup_ops.lookup_taxa_hashed(
                htab, u64.U64(qh, ql ^ dep(c)), htile, hbits, IDX.key_bits
            )
            return r.sum()

        per = timeit_loop(hashed_step, jnp.int32(0), R=8)
        out[f"hashed_{label}_Mq_s"] = round(nq / per / 1e6, 2)
        r_h = lookup_ops.lookup_taxa_hashed(htab, QUERIES, htile, hbits, IDX.key_bits)
        out[f"hashed_{label}_matches"] = bool(
            np.array_equal(np.asarray(r_tiled), np.asarray(r_h))
        )
    return out


@guard("kernel3")
def exp_kernel3():
    """Dense-probe classify kernel B sweep: locate the tiled/hashed XLA
    shape cliff seen in r2_session10 (hashed 2.7x faster at B=8192, 2x
    slower at B=32768)."""
    ensure_index()
    mp = IDX.params.minimizer_params
    table_tax = jnp.asarray(IDX.taxonomy.rpath_table())
    router = IDX.device_router
    ttab, tile = IDX.device_tiled
    htab, htile, hbits = IDX.device_hashed
    jax.block_until_ready(htab)
    out = {"tile": tile, "h_tile": htile, "h_bits": hbits}
    codes_h = np.asarray(CODES_RES)

    from slacken_tpu.classify import _classify_kernel_tiled

    for b in (8192, 16384, 32768, 65536):
        reps = -(-b // 8192)
        cd = jax.device_put(np.concatenate([codes_h] * reps)[:b])
        jax.block_until_ready(cd)

        def t_step(i, c, cd=cd):
            cc = cd.at[0, 0].set((c & 3).astype(jnp.uint8))
            wt, nd, ch, res, hp = _classify_kernel_tiled(
                cc, ttab, router, table_tax, mp, 32, IDX.router_bits,
                ("tiled", tile, True),
            )
            return res.max_taxon.sum()

        per = timeit_loop(t_step, jnp.int32(0), R=4)
        out[f"B{b}_tiled_dense_reads_s"] = round(b / per)

        def h_step(i, c, cd=cd):
            cc = cd.at[0, 0].set((c & 3).astype(jnp.uint8))
            wt, nd, ch, res, hp = _classify_kernel_tiled(
                cc, htab, router, table_tax, mp, 32, 0,
                ("hashed", htile, hbits, True),
            )
            return res.max_taxon.sum()

        per = timeit_loop(h_step, jnp.int32(0), R=4)
        out[f"B{b}_hashed_dense_reads_s"] = round(b / per)
    return out


@guard("e2e4")
def exp_e2e4():
    """Reports-mode e2e with device finalize (now default): batch-bp sweep x
    probe, plus detailed mode at the best batch size."""
    import shutil
    import tempfile

    ensure_index()
    packed, n_reads = _e2e_reads()
    out = {"n_reads": n_reads}
    cpar = ClassifyParams(thresholds=[0.0], per_read_output=False)
    best = (0.0, None)
    for probe in ("tiled", "hashed"):
        for bp in (1 << 20, 1 << 21, 1 << 22):
            cls = Classifier(
                IDX, target_batch_bp=bp, probe=probe, packed_transfer=True
            )
            cls.classify_packed(packed[:2], cpar)  # warm
            rate = 0.0
            for _ in range(2):
                t0 = time.time()
                cls.classify_packed(packed, cpar)
                rate = max(rate, n_reads / (time.time() - t0))
            out[f"{probe}_{bp >> 20}M_reads_s"] = round(rate)
            if rate > best[0]:
                best = (rate, (probe, bp))

    probe, bp = best[1]
    out["best"] = f"{probe}_{bp >> 20}M"
    import os

    dpar = ClassifyParams(thresholds=[0.0], per_read_output=True)
    for label, runs_flag in (
        ("detailed_runs", "1"),  # device hit-runs reduction (default)
        ("detailed_dense", "0"),  # dense window-taxa transfer + window walk
    ):
        os.environ["STPU_HIT_RUNS"] = runs_flag
        cls = Classifier(
            IDX, target_batch_bp=bp, probe=probe, packed_transfer=True
        )
        loc = tempfile.mkdtemp(prefix="stpu_e2e4_")
        try:
            cls.classify_and_write_packed(packed[:2], loc + "/warm", dpar)
            t0 = time.time()
            cls.classify_and_write_packed(packed, loc + "/run", dpar)
            out[f"{label}_reads_s"] = round(n_reads / (time.time() - t0))
        finally:
            shutil.rmtree(loc, ignore_errors=True)
    os.environ.pop("STPU_HIT_RUNS", None)
    return out


@guard("build2")
def exp_build2():
    """End-to-end KeyValueIndex.build on TPU with the device-resident
    hierarchical reduction (default) vs the per-batch-transfer path."""
    import importlib
    import os

    bench = importlib.import_module("bench")
    from slacken_tpu.index import IndexParams, KeyValueIndex
    from slacken_tpu.taxonomy import Taxonomy

    nodes = [(1, 1, "root"), (455631, 1, "sp"), (526997, 1, "sp"), (9606, 1, "sp")]
    tax = Taxonomy.from_nodes_and_names(nodes, [(t, f"t{t}") for t, _, _ in nodes])
    params = IndexParams(k=35, m=31, spaces=7)
    out = {}
    for label, flag in (("device", "1"), ("transfer", "0")):
        os.environ["STPU_BUILD_DEVICE"] = flag
        lib = list(bench.synthetic_library(np.random.default_rng(20260816)))
        # warm the kernel shapes
        KeyValueIndex.build(
            [(9606, "ACGT" * 100)], params, tax, batch_rows=32, row_len=1 << 16
        )
        t0 = time.time()
        idx2 = KeyValueIndex.build(
            iter(lib), params, tax, batch_rows=32, row_len=1 << 16
        )
        dt = time.time() - t0
        out[f"{label}_s"] = round(dt, 2)
        out[f"{label}_Mbp_s"] = round(8.0 / dt, 2)
        out.setdefault("records", len(idx2.keys))
    os.environ.pop("STPU_BUILD_DEVICE", None)
    return out


def _scale_lib():
    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "scale_bench", "/root/repo/scripts/scale_bench.py"
    )
    sb = _ilu.module_from_spec(spec)
    spec.loader.exec_module(sb)
    n_taxa = 64
    from slacken_tpu.taxonomy import Taxonomy

    nodes = [(1, 1, "root")] + [(10 + i, 1, "species") for i in range(n_taxa)]
    tax = Taxonomy.from_nodes_and_names(nodes, [(t, f"t{t}") for t, _, _ in nodes])
    return sb, tax, n_taxa


def _free_session_device_state():
    """Drop the bench index's cached device tables (and force a GC) so the
    scale experiments start from a clean HBM."""
    import gc

    global QUERIES, CODES_RES
    if IDX is not None:
        for attr in (
            "_device_tiled", "_device_hashed", "_device_hashed_rows",
            "_device_hashed_cols", "_device_keys", "_device_taxa",
            "_device_router", "_device_bucketed",
        ):
            if hasattr(IDX, attr):
                setattr(IDX, attr, None)
    QUERIES = None
    CODES_RES = None
    gc.collect()


@guard("scale_build_tpu")
def exp_scale_build_tpu():
    """Device build throughput at scale (0.1 Gbp -> ~33M records), both
    reduce modes. r3_session1/2: the 0.4 Gbp device-resident build OOMs
    16 GB HBM, so the big-classify index is prebuilt on CPU and the build
    datapoint taken at a safe size."""
    from slacken_tpu.index import IndexParams, KeyValueIndex

    _free_session_device_state()
    sb, tax, n_taxa = _scale_lib()
    build_bp = int(float(os.environ.get("STPU_SCALE_BUILD_GBP", "0.1")) * 1e9)
    out = {"build_bp": build_bp}
    params = IndexParams(k=35, m=31, spaces=7)
    for label, flag in (("device", "1"), ("transfer", "0")):
        os.environ["STPU_BUILD_DEVICE"] = flag
        KeyValueIndex.build(  # warm kernel shapes
            [(10, "ACGT" * 100)], params, tax, batch_rows=32, row_len=1 << 16
        )
        record("scale_build_progress", ok=True, phase=f"warm_{label}")
        t0 = time.time()
        try:
            bidx = KeyValueIndex.build(
                sb.synthetic_library(build_bp, n_taxa), params, tax,
                batch_rows=32, row_len=1 << 16,
            )
            dt = time.time() - t0
            out[f"{label}_s"] = round(dt, 1)
            out[f"{label}_Mbp_s"] = round(build_bp / dt / 1e6, 2)
            out.setdefault("records", int(len(bidx.keys)))
            del bidx
        except Exception as e:  # noqa: BLE001
            out[f"{label}_error"] = f"{type(e).__name__}: {e}"
        record("scale_build_progress", ok=True, phase=f"done_{label}", **out)
    os.environ.pop("STPU_BUILD_DEVICE", None)
    import gc

    gc.collect()
    return out


@guard("scale_classify_tpu")
def exp_scale_classify_tpu():
    """Classify 200k reads against the CPU-prebuilt 131M-record index
    (1.57 GB flat / 1.6 GB tiled in HBM): does the single-chip path hold
    its throughput at 50x the bench index?"""
    from slacken_tpu.index import KeyValueIndex
    from slacken_tpu import native
    from slacken_tpu.ops import encode as enc

    _free_session_device_state()
    sb, tax, n_taxa = _scale_lib()
    total_bp = int(float(os.environ.get("STPU_SCALE_GBP", "0.4")) * 1e9)
    prebuilt = os.environ.get(
        "STPU_SCALE_INDEX", "/root/repo/.bench_cache/scale04/idx_sharded"
    )
    t0 = time.time()
    idx = KeyValueIndex.load_shards(prebuilt, taxonomy=tax)
    out = {
        "records": int(len(idx.keys)),
        "load_s": round(time.time() - t0, 1),
    }
    record("scale_classify_progress", ok=True, phase="loaded", **out)

    rng = np.random.default_rng(7)
    sim = []
    per = 25_000
    for j, (taxon, seq) in enumerate(sb.synthetic_library(total_bp, n_taxa)):
        if j >= 8:
            break
        codes_full = enc.encode_seq(seq[: 2_000_000])
        starts = rng.integers(0, len(codes_full) - 101, per)
        rows = codes_full[starts[:, None] + np.arange(101)[None, :]].astype(np.uint8)
        mut = rng.random(rows.shape) < 0.01
        rows[mut] = rng.integers(0, 4, int(mut.sum()))
        rows = np.pad(rows, ((0, 0), (0, 27)), constant_values=4)
        sim.append(native.PackedReads(
            rows, np.full(len(rows), 101, np.int32),
            [f"s{taxon}_{i}" for i in range(len(rows))],
        ))
    n_reads = sum(len(p) for p in sim)
    out["n_reads"] = n_reads
    cpar = ClassifyParams(thresholds=[0.0], per_read_output=False)
    # 1 Mbp dispatches: the probe's padded gather transients (~1.5 kB/query)
    # must share HBM with the 1.6 GB table (r3_session3 OOM post-mortem).
    # hashed128 (column-block rows, load-factor-1 hash, ~19 B/key) is the
    # big-index candidate; the dense=0 variant probes one query per span
    # instead of per window (2.5x fewer gathers — may invert at this scale).
    cases = (
        ("hashed", 1 << 20, None),
        ("hashed128", 1 << 20, None),
        ("hashed128", 1 << 21, None),
        ("hashed128", 1 << 20, "0"),
        ("hashed", 1 << 20, "0"),
    )
    for probe, bp, dense in cases:
        label = f"{probe}_{bp >> 20}M" + ("_span" if dense == "0" else "")
        if dense is not None:
            os.environ["STPU_TILED_DENSE"] = dense
        try:
            t0 = time.time()
            cls = Classifier(
                idx, target_batch_bp=bp, probe=probe, packed_transfer=True
            )
            out[f"{label}_table_s"] = round(time.time() - t0, 1)
            cls.classify_packed(sim[:1], cpar)
            record("scale_classify_progress", ok=True, phase=f"warm_{label}", **out)
            t0 = time.time()
            cls.classify_packed(sim, cpar)
            out[f"{label}_reads_s"] = round(n_reads / (time.time() - t0))
            del cls
        except Exception as e:  # noqa: BLE001 (hashed table is ~5 GB at 131M keys)
            out[f"{label}_error"] = f"{type(e).__name__}: {e}"
        finally:
            os.environ.pop("STPU_TILED_DENSE", None)
        # drop cached device tables between probes
        for attr in (
            "_device_tiled", "_device_hashed", "_device_hashed_cols",
            "_device_router",
        ):
            if hasattr(idx, attr):
                setattr(idx, attr, None)
        import gc

        gc.collect()
        record("scale_classify_progress", ok=True, phase=f"done_{label}", **out)
    return out


@guard("e2e5")
def exp_e2e5():
    """Bench-scale hashed vs hashed128 (column-block rows): kernel-free e2e
    comparison at the production batch sizes, plus span-compacted variants
    (dense probing was chosen when probes were slower; the aligned layouts
    may invert it)."""
    ensure_index()
    packed, n_reads = _e2e_reads()
    out = {"n_reads": n_reads}
    cpar = ClassifyParams(thresholds=[0.0], per_read_output=False)
    for probe, bp, dense in (
        ("hashed", 1 << 21, None),
        ("hashed128", 1 << 21, None),
        ("hashed128", 1 << 22, None),
        ("hashed", 1 << 21, "0"),
        ("hashed128", 1 << 21, "0"),
    ):
        label = f"{probe}_{bp >> 20}M" + ("_span" if dense == "0" else "")
        if dense is not None:
            os.environ["STPU_TILED_DENSE"] = dense
        try:
            cls = Classifier(
                IDX, target_batch_bp=bp, probe=probe, packed_transfer=True
            )
            cls.classify_packed(packed[:2], cpar)
            rate = 0.0
            for _ in range(2):
                t0 = time.time()
                cls.classify_packed(packed, cpar)
                rate = max(rate, n_reads / (time.time() - t0))
            out[f"{label}_reads_s"] = round(rate)
        except Exception as e:  # noqa: BLE001
            out[f"{label}_error"] = f"{type(e).__name__}: {e}"
        finally:
            os.environ.pop("STPU_TILED_DENSE", None)
    return out


# ---------------------------------------------------------------------------
# Round-4 experiments: the single-gather row-bucket probe (hashed1), the
# column-block hashed128 layout, and the dictionary-compressed detailed-mode
# transfer (window codes).
# ---------------------------------------------------------------------------


@guard("probe4")
def exp_probe4():
    """Pure lookup throughput: hashed1 (ONE aligned row gather) and
    hashed128 (two zero-padding row gathers at load factor ~1) vs the
    shipped hashed/tiled probes, latency-corrected dependent chase."""
    ensure_queries()
    nq = lookup_ops.span_query_cap(8192 * 128)
    out = {"n_queries": nq}
    qh, ql = QUERIES.hi, QUERIES.lo

    def dep(c):
        return (c & 1).astype(jnp.uint32)

    htab, htile, hbits = IDX.device_hashed
    jax.block_until_ready(htab)
    r_ref = lookup_ops.lookup_taxa_hashed(htab, QUERIES, htile, hbits, IDX.key_bits)

    def h_step(i, c):
        r = lookup_ops.lookup_taxa_hashed(
            htab, u64.U64(qh, ql ^ dep(c)), htile, hbits, IDX.key_bits
        )
        return r.sum()

    per = timeit_loop(h_step, jnp.int32(0), R=8)
    out["hashed_Mq_s"] = round(nq / per / 1e6, 2)
    out["hashed_MB"] = round(htab.nbytes / 1e6, 1)

    for label, dev in (
        ("hashed1", IDX.device_hashed_rows),
        ("hashed128", IDX.device_hashed_cols),
    ):
        tab, tile, bits = dev
        jax.block_until_ready(tab)
        out[f"{label}_tile"] = tile
        out[f"{label}_bits"] = bits
        out[f"{label}_MB"] = round(tab.nbytes / 1e6, 1)
        lk = (
            lookup_ops.lookup_taxa_hashed_rows
            if label == "hashed1"
            else lookup_ops.lookup_taxa_hashed_cols
        )

        def step(i, c, tab=tab, tile=tile, bits=bits, lk=lk):
            r = lk(tab, u64.U64(qh, ql ^ dep(c)), tile, bits, IDX.key_bits)
            return r.sum()

        per = timeit_loop(step, jnp.int32(0), R=8)
        out[f"{label}_Mq_s"] = round(nq / per / 1e6, 2)
        r = lk(tab, QUERIES, tile, bits, IDX.key_bits)
        out[f"{label}_matches"] = bool(
            np.array_equal(np.asarray(r_ref), np.asarray(r))
        )
    return out


@guard("kernel4")
def exp_kernel4():
    """Dense classify kernel B sweep: hashed1 (single gather) vs the shipped
    hashed (two gathers). The probe is ~2/3 of the kernel at the gather
    wall, so hashed1's ceiling is ~+45% if the gather count is what binds."""
    ensure_index()
    mp = IDX.params.minimizer_params
    table_tax = jnp.asarray(IDX.taxonomy.rpath_table())
    router = IDX.device_router
    htab, htile, hbits = IDX.device_hashed
    rtab, rtile, rbits2 = IDX.device_hashed_rows
    jax.block_until_ready((htab, rtab))
    out = {"h1_tile": rtile, "h1_bits": rbits2}
    codes_h = np.asarray(CODES_RES)

    from slacken_tpu.classify import _classify_kernel_tiled

    for b in (8192, 16384, 32768, 65536):
        reps = -(-b // 8192)
        cd = jax.device_put(np.concatenate([codes_h] * reps)[:b])
        jax.block_until_ready(cd)

        def h_step(i, c, cd=cd):
            cc = cd.at[0, 0].set((c & 3).astype(jnp.uint8))
            wt, nd, ch, res, hp = _classify_kernel_tiled(
                cc, htab, router, table_tax, mp, 32, 0,
                ("hashed", htile, hbits, True),
            )
            return res.max_taxon.sum()

        per = timeit_loop(h_step, jnp.int32(0), R=4)
        out[f"B{b}_hashed_reads_s"] = round(b / per)

        def r_step(i, c, cd=cd):
            cc = cd.at[0, 0].set((c & 3).astype(jnp.uint8))
            wt, nd, ch, res, hp = _classify_kernel_tiled(
                cc, rtab, router, table_tax, mp, 32, 0,
                ("hashed1", rtile, rbits2, True),
            )
            return res.max_taxon.sum()

        per = timeit_loop(r_step, jnp.int32(0), R=4)
        out[f"B{b}_hashed1_reads_s"] = round(b / per)
    return out


@guard("e2e6")
def exp_e2e6():
    """Round-4 e2e: reports mode hashed1 vs hashed (batch sweep), detailed
    mode with the dictionary-compressed window-codes transfer on vs off."""
    import os
    import shutil
    import tempfile

    ensure_index()
    packed, n_reads = _e2e_reads()
    out = {"n_reads": n_reads}
    cpar = ClassifyParams(thresholds=[0.0], per_read_output=False)
    best = (0.0, None)
    for probe in ("hashed1", "hashed"):
        for bp in (1 << 21, 1 << 22, 1 << 23):
            cls = Classifier(
                IDX, target_batch_bp=bp, probe=probe, packed_transfer=True
            )
            cls.classify_packed(packed[:2], cpar)  # warm
            rate = 0.0
            for _ in range(2):
                t0 = time.time()
                cls.classify_packed(packed, cpar)
                rate = max(rate, n_reads / (time.time() - t0))
            out[f"{probe}_{bp >> 20}M_reads_s"] = round(rate)
            if rate > best[0]:
                best = (rate, (probe, bp))
    probe, bp = best[1]
    out["best"] = f"{probe}_{bp >> 20}M"

    dpar = ClassifyParams(thresholds=[0.0], per_read_output=True)
    os.environ["STPU_HIT_RUNS"] = "0"
    for label, wc in (("detailed_codes", "1"), ("detailed_dense", "0")):
        os.environ["STPU_WINDOW_CODES"] = wc
        cls = Classifier(
            IDX, target_batch_bp=bp, probe=probe, packed_transfer=True
        )
        loc = tempfile.mkdtemp(prefix="stpu_e2e6_")
        try:
            cls.classify_and_write_packed(packed[:2], loc + "/warm", dpar)
            t0 = time.time()
            cls.classify_and_write_packed(packed, loc + "/run", dpar)
            out[f"{label}_reads_s"] = round(n_reads / (time.time() - t0))
        finally:
            shutil.rmtree(loc, ignore_errors=True)
    os.environ.pop("STPU_WINDOW_CODES", None)
    os.environ.pop("STPU_HIT_RUNS", None)
    return out


@guard("build4")
def exp_build4():
    """Phase split of the 8 Mbp bench build on TPU: host packing, the
    per-batch scan/sort kernel, the global reduce, and the final d2h —
    locate what keeps e2e at ~2 Mbp/s when the scan kernel does 23.6."""
    ensure_index()
    from slacken_tpu.index import _build_batch_kernel, _reduce_chunks_kernel

    mp = IDX.params.minimizer_params
    out = {}
    rng = np.random.default_rng(5)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    seqs = [
        encode.encode_seq(lut[rng.integers(0, 4, 1 << 16)].tobytes().decode())
        for _ in range(32)
    ]
    t0 = time.time()
    for _ in range(4):
        codes, _ = encode.pack_batch(seqs, 1 << 16)
    out["pack_host_ms_per_2Mbp"] = round((time.time() - t0) / 4 * 1e3, 1)

    taxa_rows = rng.integers(1, 100, 32).astype(np.int32)
    cd = jax.device_put(codes)
    jax.block_until_ready(cd)
    cap_dr = 32 * (1 << 16)

    def bstep(i, c):
        cc = cd.at[0, 0].set((c & 3).astype(jnp.uint8))
        o = _build_batch_kernel(cc, taxa_rows, mp, cap_dr)
        return o[0, 0].astype(jnp.int32)

    per = timeit_loop(bstep, jnp.int32(0), R=4)
    out["batch_kernel_ms_per_2Mbp"] = round(per * 1e3, 1)
    out["batch_kernel_Mbp_s"] = round(cap_dr / per / 1e6, 1)

    # global reduce of 4 batch outputs (the bench build's one big sort)
    chunk = _build_batch_kernel(cd, taxa_rows, mp, cap_dr)[:, :cap_dr]
    hi = jnp.concatenate([chunk[0]] * 4)
    lo = jnp.concatenate([chunk[1]] * 4)
    tx = jnp.concatenate([chunk[2]] * 4).view(jnp.int32)
    table_dev = jnp.asarray(IDX.taxonomy.rpath_table())
    jax.block_until_ready((hi, lo, tx))

    def rstep(i, c):
        red, n = _reduce_chunks_kernel(hi ^ (c & 1).astype(jnp.uint32), lo, tx, table_dev)
        return n.astype(jnp.int32)

    per = timeit_loop(rstep, jnp.int32(0), R=3)
    out["reduce_8M_ms"] = round(per * 1e3, 1)

    red, n = _reduce_chunks_kernel(hi, lo, tx, table_dev)
    jax.block_until_ready(red)
    t0 = time.time()
    np.asarray(red[:, : int(np.asarray(n))])
    out["final_d2h_s"] = round(time.time() - t0, 2)
    out["final_d2h_MB"] = round(red.nbytes / 1e6, 1)
    return out


@guard("build5")
def exp_build5():
    """e2e bench build after the lone-leaf re-reduce fix, device-resident
    vs per-batch transfer (supersedes build2)."""
    import importlib

    bench = importlib.import_module("bench")
    from slacken_tpu.index import IndexParams, KeyValueIndex
    from slacken_tpu.taxonomy import Taxonomy

    nodes = [(1, 1, "root"), (455631, 1, "sp"), (526997, 1, "sp"), (9606, 1, "sp")]
    tax = Taxonomy.from_nodes_and_names(nodes, [(t, f"t{t}") for t, _, _ in nodes])
    params = IndexParams(k=35, m=31, spaces=7)
    out = {}
    for label, flag in (("device", "1"), ("transfer", "0")):
        os.environ["STPU_BUILD_DEVICE"] = flag
        lib = list(bench.synthetic_library(np.random.default_rng(20260816)))
        KeyValueIndex.build(
            [(9606, "ACGT" * 100)], params, tax, batch_rows=32, row_len=1 << 16
        )
        best = 0.0
        for _ in range(2):
            t0 = time.time()
            idx2 = KeyValueIndex.build(
                iter(lib), params, tax, batch_rows=32, row_len=1 << 16
            )
            best = max(best, 8.0 / (time.time() - t0))
        out[f"{label}_Mbp_s"] = round(best, 2)
        out.setdefault("records", len(idx2.keys))
    os.environ.pop("STPU_BUILD_DEVICE", None)
    return out


@guard("kernel5")
def exp_kernel5():
    """hashed1 tile sweep at B=65536: r4_session2 showed the kernel is HBM-
    BYTES-bound (the [Q, 3*tile] gather result is materialised — 12.9 GB
    written+read at tile=128/B=65536, and tile=64/256 compile-OOMed), so a
    narrower row should trade table load factor for ~linear kernel speedup.
    Every variant individually guarded (one OOM must not kill the sweep)."""
    ensure_index()
    mp = IDX.params.minimizer_params
    table_tax = jnp.asarray(IDX.taxonomy.rpath_table())
    router = IDX.device_router
    out = {}
    codes_h = np.asarray(CODES_RES)

    from slacken_tpu.classify import _classify_kernel_tiled

    cd64 = jax.device_put(np.concatenate([codes_h] * 8))
    jax.block_until_ready(cd64)
    for tile in (32, 64, 128):
        try:
            tab, t_, rb = lookup_ops.build_hashed_rows(
                IDX.keys, IDX.taxa, IDX.key_bits, tile=tile
            )
            tab = jnp.asarray(tab)
            jax.block_until_ready(tab)
            out[f"t{tile}_bits"] = rb
            out[f"t{tile}_MB"] = round(tab.nbytes / 1e6, 1)

            def step(i, c, tab=tab, t_=t_, rb=rb):
                cc = cd64.at[0, 0].set((c & 3).astype(jnp.uint8))
                wt, nd, ch, res, hp = _classify_kernel_tiled(
                    cc, tab, router, table_tax, mp, 32, 0,
                    ("hashed1", t_, rb, True),
                )
                return res.max_taxon.sum()

            per = timeit_loop(step, jnp.int32(0), R=4)
            out[f"t{tile}_B65536_reads_s"] = round(65536 / per)
            del tab
        except Exception as e:  # noqa: BLE001
            out[f"t{tile}_error"] = f"{type(e).__name__}: {e}"[:200]
    return out


@guard("e2e8")
def exp_e2e8():
    """e2e reports mode with the narrow-tile hashed1 variants (if a tile
    wins kernel5, confirm it end-to-end before flipping the default)."""
    import shutil
    import tempfile

    ensure_index()
    packed, n_reads = _e2e_reads()
    out = {"n_reads": n_reads}
    cpar = ClassifyParams(thresholds=[0.0], per_read_output=False)
    for tile in (32, 64):
        try:
            tab, t_, rb = lookup_ops.build_hashed_rows(
                IDX.keys, IDX.taxa, IDX.key_bits, tile=tile
            )
            cls = Classifier(
                IDX, target_batch_bp=1 << 22, probe="hashed1",
                packed_transfer=True,
            )
            # swap in the narrow-tile table under the same kernel
            cls._dev_keys = jax.device_put(tab)
            cls._probe_static = ("hashed1", t_, rb, True)
            loc = tempfile.mkdtemp(prefix="stpu_e2e8_")
            try:
                cls.classify_and_write_packed(packed[:1], loc + "/warm", cpar)
                best = 0.0
                for t in range(3):
                    t0 = time.time()
                    cls.classify_and_write_packed(packed, loc + f"/t{t}", cpar)
                    best = max(best, n_reads / (time.time() - t0))
                out[f"t{tile}_4M_reads_s"] = round(best)
            finally:
                shutil.rmtree(loc, ignore_errors=True)
        except Exception as e:  # noqa: BLE001
            out[f"t{tile}_error"] = f"{type(e).__name__}: {e}"[:200]
    return out


@guard("e2e7")
def exp_e2e7():
    """The exact bench path (classify_and_write_packed, reports mode) at
    4/8/16 Mbp batches with the hashed1 default: does a bigger dispatch
    amortise the tunnel's 37 ms latency further?"""
    import shutil
    import tempfile

    ensure_index()
    packed, n_reads = _e2e_reads()
    out = {"n_reads": n_reads}
    cpar = ClassifyParams(thresholds=[0.0], per_read_output=False)
    # 16 Mbp is OUT: the dense hashed1 probe materialises a [Q, 3*128] u32
    # gather result, which at 16M positions is ~24 GB — the r4_session5
    # compile OOMed exactly there (u32[16777216,384] > 16 GB HBM)
    for bp, depth in ((1 << 22, 3), (1 << 23, 3), (1 << 23, 6)):
        label = f"hashed1_{bp >> 20}M_d{depth}"
        os.environ["STPU_PIPELINE_DEPTH"] = str(depth)
        loc = tempfile.mkdtemp(prefix="stpu_e2e7_")
        try:
            cls = Classifier(IDX, target_batch_bp=bp, probe="hashed1",
                             packed_transfer=True)
            cls.classify_and_write_packed(packed[:1], loc + "/warm", cpar)
            best = 0.0
            for t in range(3):
                t0 = time.time()
                cls.classify_and_write_packed(packed, loc + f"/t{t}", cpar)
                best = max(best, n_reads / (time.time() - t0))
            out[f"{label}_reads_s"] = round(best)
        except Exception as e:  # noqa: BLE001 - one OOM must not kill the sweep
            out[f"{label}_error"] = f"{type(e).__name__}: {e}"[:200]
        finally:
            shutil.rmtree(loc, ignore_errors=True)
            os.environ.pop("STPU_PIPELINE_DEPTH", None)
    return out


@guard("e2e9")
def exp_e2e9():
    """Detailed-mode re-measurement with the RANK-code window-codes kernel
    (r4: the v1 argmax kernel lost 15.6k vs dense 47.7k; the rank rewrite
    is T fused VPU passes — if the kernel cost is gone, the 2x d2h saving
    should now win on the 41 MB/s link)."""
    import shutil
    import tempfile

    ensure_index()
    packed, n_reads = _e2e_reads()
    out = {"n_reads": n_reads}
    dpar = ClassifyParams(thresholds=[0.0], per_read_output=True)
    os.environ["STPU_HIT_RUNS"] = "0"
    for label, wc in (("detailed_rankcodes", "1"), ("detailed_dense", "0")):
        os.environ["STPU_WINDOW_CODES"] = wc
        cls = Classifier(IDX, probe="hashed1", packed_transfer=True)
        loc = tempfile.mkdtemp(prefix="stpu_e2e9_")
        try:
            cls.classify_and_write_packed(packed[:1], loc + "/warm", dpar)
            best = 0.0
            for t in range(3):
                t0 = time.time()
                cls.classify_and_write_packed(packed, loc + f"/t{t}", dpar)
                best = max(best, n_reads / (time.time() - t0))
            out[f"{label}_reads_s"] = round(best)
        finally:
            shutil.rmtree(loc, ignore_errors=True)
    os.environ.pop("STPU_WINDOW_CODES", None)
    os.environ.pop("STPU_HIT_RUNS", None)
    return out


@guard("e2e10")
def exp_e2e10():
    """Pipeline-depth sweep through the bench path: with the kernel at
    ~1 us/read, the 37 ms dispatch latency and host packing set the e2e
    ceiling — does a deeper in-flight queue hide more of it?"""
    import shutil
    import tempfile

    ensure_index()
    packed, n_reads = _e2e_reads()
    out = {"n_reads": n_reads}
    cpar = ClassifyParams(thresholds=[0.0], per_read_output=False)
    for depth in (2, 3, 6):
        os.environ["STPU_PIPELINE_DEPTH"] = str(depth)
        cls = Classifier(IDX, probe="hashed1", packed_transfer=True)
        loc = tempfile.mkdtemp(prefix="stpu_e2e10_")
        try:
            cls.classify_and_write_packed(packed[:1], loc + "/warm", cpar)
            best = 0.0
            for t in range(3):
                t0 = time.time()
                cls.classify_and_write_packed(packed, loc + f"/t{t}", cpar)
                best = max(best, n_reads / (time.time() - t0))
            out[f"depth{depth}_reads_s"] = round(best)
        finally:
            shutil.rmtree(loc, ignore_errors=True)
    os.environ.pop("STPU_PIPELINE_DEPTH", None)
    return out


@guard("scale_classify2")
def exp_scale_classify2():
    """Classify 200k reads against the 131M-record (1.57 GB) index with
    hashed1 — r3's best at this scale was hashed at 31.1k reads/s."""
    from slacken_tpu.index import KeyValueIndex
    from slacken_tpu import native
    from slacken_tpu.ops import encode as enc

    _free_session_device_state()
    sb, tax, n_taxa = _scale_lib()
    total_bp = int(float(os.environ.get("STPU_SCALE_GBP", "0.4")) * 1e9)
    prebuilt = os.environ.get(
        "STPU_SCALE_INDEX", "/root/repo/.bench_cache/scale04/idx_sharded"
    )
    t0 = time.time()
    idx = KeyValueIndex.load_shards(prebuilt, taxonomy=tax)
    out = {"records": int(len(idx.keys)), "load_s": round(time.time() - t0, 1)}
    record("scale_classify2_progress", ok=True, phase="loaded", **out)

    rng = np.random.default_rng(7)
    sim = []
    per = 25_000
    for j, (taxon, seq) in enumerate(sb.synthetic_library(total_bp, n_taxa)):
        if j >= 8:
            break
        codes_full = enc.encode_seq(seq[: 2_000_000])
        starts = rng.integers(0, len(codes_full) - 101, per)
        rows = codes_full[starts[:, None] + np.arange(101)[None, :]].astype(np.uint8)
        mut = rng.random(rows.shape) < 0.01
        rows[mut] = rng.integers(0, 4, int(mut.sum()))
        rows = np.pad(rows, ((0, 0), (0, 27)), constant_values=4)
        sim.append(native.PackedReads(
            rows, np.full(len(rows), 101, np.int32),
            [f"s{taxon}_{i}" for i in range(len(rows))],
        ))
    n_reads = sum(len(p) for p in sim)
    out["n_reads"] = n_reads
    cpar = ClassifyParams(thresholds=[0.0], per_read_output=False)
    for bp in (1 << 21, 1 << 22):
        label = f"hashed1_{bp >> 20}M"
        try:
            t0 = time.time()
            cls = Classifier(idx, target_batch_bp=bp, probe="hashed1",
                             packed_transfer=True)
            out[f"{label}_table_s"] = round(time.time() - t0, 1)
            cls.classify_packed(sim[:1], cpar)
            record("scale_classify2_progress", ok=True, phase=f"warm_{label}", **out)
            t0 = time.time()
            cls.classify_packed(sim, cpar)
            out[f"{label}_reads_s"] = round(n_reads / (time.time() - t0))
            del cls
        except Exception as e:  # noqa: BLE001
            out[f"{label}_error"] = f"{type(e).__name__}: {e}"[:300]
        if hasattr(idx, "_device_hashed_rows"):
            idx._device_hashed_rows = None
        import gc

        gc.collect()
    return out


@guard("bench_warm")
def exp_bench_warm():
    """Warm the persistent jit cache with EXACTLY the shapes bench.py
    compiles (the .jax_cache + .bench_cache are gitignored and were wiped
    between rounds — a cold driver bench burns its stall budget on
    compiles). Replicates bench.py's classify path (default Classifier,
    warm batch + full workload) and its tiny warmup build. The full 8 Mbp
    fresh-build shapes are warmed by load_index's cache rebuild + build6."""
    import shutil
    import tempfile

    from slacken_tpu.index import IndexParams
    from slacken_tpu.taxonomy import Taxonomy

    ensure_index()
    packed, n_reads = _e2e_reads()
    out = {"n_reads": n_reads}
    cpar = ClassifyParams(thresholds=[0.0], per_read_output=False)
    cls = Classifier(IDX)  # bench.py uses pure defaults
    loc = tempfile.mkdtemp(prefix="stpu_benchwarm_")
    try:
        t0 = time.time()
        cls.classify_and_write_packed(packed[:1], loc + "/warm", cpar)
        out["warm_batch_s"] = round(time.time() - t0, 1)
        best = 0.0
        for t in range(3):
            t0 = time.time()
            cls.classify_and_write_packed(packed, loc + f"/t{t}", cpar)
            best = max(best, n_reads / (time.time() - t0))
        out["bench_path_reads_s"] = round(best)
    finally:
        shutil.rmtree(loc, ignore_errors=True)
    nodes = [(1, 1, "root"), (455631, 1, "species"),
             (526997, 1, "species"), (9606, 1, "species")]
    tax = Taxonomy.from_nodes_and_names(
        nodes, [(t, f"taxon{t}") for t, _, _ in nodes]
    )
    t0 = time.time()
    KeyValueIndex.build(  # bench.py's tiny build-warmup shapes
        [(9606, "ACGT" * 100)], IndexParams(k=35, m=31, spaces=7), tax,
        batch_rows=32, row_len=1 << 16,
    )
    out["tiny_build_s"] = round(time.time() - t0, 1)
    return out


@guard("build6")
def exp_build6():
    """Phase-traced fresh bench build (the exact bench.py measurement):
    build4 accounted for ~1.2s of the measured ~4.1s warm build — where do
    the other ~3s go? STPU_BUILD_TRACE times fragment generation,
    encode_seq, host packing, kernel dispatch, device reduces, and the
    final d2h inside KeyValueIndex.build itself."""
    import importlib.util as _ilu

    from slacken_tpu.index import IndexParams
    from slacken_tpu.taxonomy import Taxonomy

    spec = _ilu.spec_from_file_location("bench", "/root/repo/bench.py")
    bench = _ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)
    nodes = [(1, 1, "root"), (455631, 1, "species"),
             (526997, 1, "species"), (9606, 1, "species")]
    tax = Taxonomy.from_nodes_and_names(
        nodes, [(t, f"taxon{t}") for t, _, _ in nodes]
    )
    out = {}
    os.environ["STPU_BUILD_TRACE"] = "1"
    try:
        for trial in ("cold", "warm"):
            t0 = time.time()
            idx = KeyValueIndex.build(
                bench.synthetic_library(np.random.default_rng(20260816)),
                IndexParams(k=35, m=31, spaces=7), tax,
                batch_rows=32, row_len=1 << 16,
            )
            dt = time.time() - t0
            out[f"{trial}_s"] = round(dt, 2)
            out[f"{trial}_mbp_s"] = round(8.0 / dt, 2)
            ph = getattr(idx, "_build_phases", None)
            if ph is not None:
                out[f"{trial}_phases"] = {
                    k: round(v, 2) for k, v in sorted(
                        ph.totals.items(), key=lambda kv: -kv[1]
                    )
                }
            out[f"{trial}_records"] = len(idx.keys)
    finally:
        os.environ.pop("STPU_BUILD_TRACE", None)
    return out


@guard("build7")
def exp_build7():
    """Attack the two dominant warm-build phases found by build6
    (final_d2h 1.62s, device_reduce 1.11s of a 2.86s build):
    (a) characterize d2h layout cost — [3, X] u32 (the reduce output, whose
    3-row sublane dim pads to 8 under (8,128) tiling) vs a 1-D ravel vs a
    plain 1-D array of the same bytes; (b) h2d of a raw [32, 65536] u8
    codes batch vs its 2-bit packing (is a packed build transfer worth
    implementing?); (c) A/B the full bench build with STPU_BUILD_FLAT_D2H."""
    import importlib.util as _ilu

    from slacken_tpu.index import IndexParams
    from slacken_tpu.taxonomy import Taxonomy
    from slacken_tpu.ops import encode as enc

    out = {}
    X = 2_883_584  # bucket(2623028): the real final-transfer shape
    rng = np.random.default_rng(3)
    host23 = rng.integers(0, 1 << 32, (3, X), dtype=np.uint32)
    a23 = jax.device_put(host23)
    jax.block_until_ready(a23)
    for label, fetch in (
        ("d2h_3xX", lambda: np.asarray(a23)),
        ("d2h_ravel", lambda: np.asarray(jnp.ravel(a23))),
        ("d2h_flat1d", lambda: np.asarray(jax.device_put(host23.reshape(-1)))),
    ):
        fetch()  # warm any relayout compile
        t0 = time.time()
        fetch()
        dt = time.time() - t0
        out[f"{label}_s"] = round(dt, 2)
        out[f"{label}_MB_s"] = round(host23.nbytes / dt / 1e6, 1)
    del a23

    codes = rng.integers(0, 4, (32, 1 << 16), dtype=np.uint8)
    t0 = time.time()
    for _ in range(4):
        jax.block_until_ready(jax.device_put(codes))
    out["h2d_codes_2Mbp_ms"] = round((time.time() - t0) / 4 * 1e3, 1)
    packed, valid = enc.pack_2bit(codes)
    t0 = time.time()
    for _ in range(4):
        jax.block_until_ready(
            (jax.device_put(packed), jax.device_put(valid))
        )
    out["h2d_packed_2Mbp_ms"] = round((time.time() - t0) / 4 * 1e3, 1)

    spec = _ilu.spec_from_file_location("bench", "/root/repo/bench.py")
    bench = _ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)
    nodes = [(1, 1, "root"), (455631, 1, "species"),
             (526997, 1, "species"), (9606, 1, "species")]
    tax = Taxonomy.from_nodes_and_names(
        nodes, [(t, f"taxon{t}") for t, _, _ in nodes]
    )
    os.environ["STPU_BUILD_TRACE"] = "1"
    try:
        for flat in ("0", "1", "1b"):
            os.environ["STPU_BUILD_FLAT_D2H"] = flat[0]
            t0 = time.time()
            idx = KeyValueIndex.build(
                bench.synthetic_library(np.random.default_rng(20260816)),
                IndexParams(k=35, m=31, spaces=7), tax,
                batch_rows=32, row_len=1 << 16,
            )
            dt = time.time() - t0
            out[f"flat{flat}_s"] = round(dt, 2)
            out[f"flat{flat}_mbp_s"] = round(8.0 / dt, 2)
            ph = getattr(idx, "_build_phases", None)
            if ph is not None:
                out[f"flat{flat}_d2h_s"] = round(
                    ph.totals.get("final_d2h", 0.0), 2
                )
                out[f"flat{flat}_reduce_s"] = round(
                    ph.totals.get("device_reduce", 0.0), 2
                )
            out[f"flat{flat}_records"] = len(idx.keys)
    finally:
        os.environ.pop("STPU_BUILD_FLAT_D2H", None)
        os.environ.pop("STPU_BUILD_TRACE", None)
    return out


@guard("build_dr")
def exp_build_dr():
    """Round-5 device-resident build->serve (VERDICT r4 #3): the finished
    records STAY on device and the hashed1 serve table builds there too, so
    the 31 MB final d2h (95% of the warm tunnel build) leaves the build
    path entirely. Measures: (a) warm device-resident build Mbp/s, (b) the
    on-device serve-table construction, (c) the deferred materialization
    d2h (what save() would pay), (d) the host-materializing build for A/B,
    (e) classify correctness straight from the device-resident index."""
    import importlib.util as _ilu

    from slacken_tpu.index import IndexParams
    from slacken_tpu.taxonomy import Taxonomy

    spec = _ilu.spec_from_file_location("bench", "/root/repo/bench.py")
    bench = _ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)
    nodes = [(1, 1, "root"), (455631, 1, "species"),
             (526997, 1, "species"), (9606, 1, "species")]
    tax = Taxonomy.from_nodes_and_names(
        nodes, [(t, f"taxon{t}") for t, _, _ in nodes]
    )
    out = {}

    def fresh_build():
        return KeyValueIndex.build(
            bench.synthetic_library(np.random.default_rng(20260816)),
            IndexParams(k=35, m=31, spaces=7), tax,
            batch_rows=32, row_len=1 << 16,
        )

    os.environ["STPU_DEVICE_RESIDENT"] = "1"
    os.environ["STPU_BUILD_DEVICE"] = "1"  # explicit so CPU shakeouts match
    try:
        fresh_build()  # warm compiles
        t0 = time.time()
        idx = fresh_build()
        dt = time.time() - t0
        out["dr_warm_s"] = round(dt, 2)
        out["dr_warm_mbp_s"] = round(8.0 / dt, 2)
        out["dr_records"] = idx.num_records
        # serve-table construction on device
        t0 = time.time()
        table, tile, rb = idx.device_hashed_rows
        jax.block_until_ready(table)
        out["serve_table_s"] = round(time.time() - t0, 2)
        out["serve_table_MB"] = round(table.nbytes / 1e6, 1)
        # classify a small batch straight from the device-resident index
        cls = Classifier(idx, probe="hashed1")
        packed, n_reads = _e2e_reads()
        import shutil
        import tempfile

        loc = tempfile.mkdtemp(prefix="stpu_dr_")
        try:
            cpar = ClassifyParams(thresholds=[0.0], per_read_output=False)
            cls.classify_and_write_packed(packed, loc + "/w", cpar)
            t0 = time.time()
            cls.classify_and_write_packed(packed, loc + "/t", cpar)
            out["dr_classify_reads_s"] = round(n_reads / (time.time() - t0))
            rep = open(loc + "/t_c0.0/all_kreport.txt").read().splitlines()
            uncl = next(
                (int(l.split("\t")[1]) for l in rep if l.endswith("unclassified")),
                0,
            )
            out["dr_classified"] = n_reads - uncl
        finally:
            shutil.rmtree(loc, ignore_errors=True)
        assert idx._keys is None, "serve path must not materialize host keys"
        # deferred materialization (what save() pays)
        t0 = time.time()
        k = idx.keys
        out["materialize_d2h_s"] = round(time.time() - t0, 2)
        out["materialize_records"] = len(k)
    finally:
        os.environ["STPU_DEVICE_RESIDENT"] = "0"
    # host-materializing A/B
    fresh_build()
    t0 = time.time()
    idx_h = fresh_build()
    dt = time.time() - t0
    out["host_warm_s"] = round(dt, 2)
    out["host_warm_mbp_s"] = round(8.0 / dt, 2)
    out["identical"] = bool(np.array_equal(idx_h.keys, k))
    os.environ.pop("STPU_DEVICE_RESIDENT", None)
    os.environ.pop("STPU_BUILD_DEVICE", None)
    return out


@guard("build_dr2")
def exp_build_dr2():
    """Device-resident build after the raw-chunk change (per-batch
    sort/scatter removed — _scan_batch_records_kernel): batch_rows sweep,
    warm serve-table timing, classify sanity."""
    import importlib.util as _ilu

    from slacken_tpu.index import IndexParams
    from slacken_tpu.taxonomy import Taxonomy

    spec = _ilu.spec_from_file_location("bench", "/root/repo/bench.py")
    bench = _ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)
    nodes = [(1, 1, "root"), (455631, 1, "species"),
             (526997, 1, "species"), (9606, 1, "species")]
    tax = Taxonomy.from_nodes_and_names(
        nodes, [(t, f"taxon{t}") for t, _, _ in nodes]
    )
    out = {}
    os.environ["STPU_DEVICE_RESIDENT"] = "1"
    os.environ["STPU_BUILD_DEVICE"] = "1"
    try:
        for br in (32, 64, 128):
            def fb(br=br):
                return KeyValueIndex.build(
                    bench.synthetic_library(np.random.default_rng(20260816)),
                    IndexParams(k=35, m=31, spaces=7), tax,
                    batch_rows=br, row_len=1 << 16,
                )

            try:
                fb()
                t0 = time.time()
                idx = fb()
                dt = time.time() - t0
                out[f"br{br}_s"] = round(dt, 2)
                out[f"br{br}_mbp_s"] = round(8.0 / dt, 2)
                out[f"br{br}_records"] = idx.num_records
            except Exception as e:  # noqa: BLE001
                out[f"br{br}_error"] = f"{type(e).__name__}: {e}"[:200]
        # serve table: cold (compile) then warm (re-build on a fresh index)
        t0 = time.time()
        tab1, tile, rb = idx.device_hashed_rows
        jax.block_until_ready(tab1)
        out["serve_cold_s"] = round(time.time() - t0, 2)
        idx2 = fb()
        t0 = time.time()
        tab2, _, _ = idx2.device_hashed_rows
        jax.block_until_ready(tab2)
        out["serve_warm_s"] = round(time.time() - t0, 2)
        # sanity: classify from the device-resident index
        cls = Classifier(idx2, probe="hashed1")
        packed, n_reads = _e2e_reads()
        import shutil
        import tempfile

        loc = tempfile.mkdtemp(prefix="stpu_dr2_")
        try:
            cpar = ClassifyParams(thresholds=[0.0], per_read_output=False)
            cls.classify_and_write_packed(packed, loc + "/w", cpar)
            t0 = time.time()
            cls.classify_and_write_packed(packed, loc + "/t", cpar)
            out["classify_reads_s"] = round(n_reads / (time.time() - t0))
            rep = open(loc + "/t_c0.0/all_kreport.txt").read().splitlines()
            uncl = next(
                (int(l.split("\t")[1]) for l in rep
                 if l.endswith("unclassified")), 0,
            )
            out["classified"] = n_reads - uncl
        finally:
            shutil.rmtree(loc, ignore_errors=True)
    finally:
        os.environ.pop("STPU_DEVICE_RESIDENT", None)
        os.environ.pop("STPU_BUILD_DEVICE", None)
    return out


@guard("kernel6")
def exp_kernel6():
    """Round-5 roofline push (VERDICT r4 #7): dense vs SPAN-COMPACTED
    hashed1 probing. Dense probes every window position (~94/row at the
    bench shape) and sits at the per-row gather wall; span compaction
    probes one query per super-mer (~51/row incl. pad) for 1.8x fewer
    gathers, at the cost of the compact+scatter machinery that the r2-era
    measurement (tiled probe, 280 M independent gathers/s) said wasn't
    worth it. hashed1 changed the economics: the probe is now the wall."""
    ensure_index()
    mp = IDX.params.minimizer_params
    table_tax = jnp.asarray(IDX.taxonomy.rpath_table())
    router = IDX.device_router
    out = {}
    codes_h = np.asarray(CODES_RES)

    from slacken_tpu.classify import _classify_kernel_tiled

    tab, tile, rb = IDX.device_hashed_rows
    out["tile"], out["row_bits"] = tile, rb
    for reps, label in ((2, "B16384"), (8, "B65536")):
        cd = jax.device_put(np.concatenate([codes_h] * reps))
        jax.block_until_ready(cd)
        B = cd.shape[0]
        for dense in (True, False):
            name = f"{label}_{'dense' if dense else 'span'}"
            try:
                def step(i, c, tab=tab, tile=tile, rb=rb, dense=dense, cd=cd):
                    cc = cd.at[0, 0].set((c & 3).astype(jnp.uint8))
                    wt, nd, ch, res, hp = _classify_kernel_tiled(
                        cc, tab, router, table_tax, mp, 32, 0,
                        ("hashed1", tile, rb, dense),
                    )
                    return res.max_taxon.sum()

                per = timeit_loop(step, jnp.int32(0), R=4)
                out[f"{name}_reads_s"] = round(B / per)
            except Exception as e:  # noqa: BLE001
                out[f"{name}_error"] = f"{type(e).__name__}: {e}"[:200]
        del cd
    return out


@guard("e2e11")
def exp_e2e11():
    """e2e reports-mode A/B of dense vs span-compacted hashed1 through the
    production pipeline (follows kernel6; the e2e number is what bench.py
    captures)."""
    ensure_index()
    packed, n_reads = _e2e_reads()
    import shutil
    import tempfile

    out = {"n_reads": n_reads}
    cpar = ClassifyParams(thresholds=[0.0], per_read_output=False)
    for dense_env, label in (("1", "dense"), ("0", "span")):
        os.environ["STPU_TILED_DENSE"] = dense_env
        try:
            cls = Classifier(IDX, probe="hashed1")
            loc = tempfile.mkdtemp(prefix="stpu_e2e11_")
            try:
                cls.classify_and_write_packed(packed, loc + "/w", cpar)
                best = 0.0
                for t in range(3):
                    t0 = time.time()
                    cls.classify_and_write_packed(packed, loc + f"/t{t}", cpar)
                    best = max(best, n_reads / (time.time() - t0))
                out[f"{label}_reads_s"] = round(best)
                rep = open(loc + "/t2_c0.0/all_kreport.txt").read().splitlines()
                uncl = next(
                    (int(l.split("\t")[1]) for l in rep
                     if l.endswith("unclassified")), 0,
                )
                out[f"{label}_classified"] = n_reads - uncl
            finally:
                shutil.rmtree(loc, ignore_errors=True)
        finally:
            os.environ.pop("STPU_TILED_DENSE", None)
    return out


@guard("e2e12")
def exp_e2e12():
    """Detailed-mode e2e with the native full-line dense formatter
    (stpu_output_lines_dense + stpu_gather_rows + bytes writer, zero
    per-read Python — r5_session3). Dense previously measured 55.3k
    reads/s at 71% of the 77.6k link ceiling with host formatting the
    gap suspect; the formatter now measures 1.5M rows/s on this host,
    so any remaining gap is link + finalize bundles."""
    import shutil
    import tempfile

    ensure_index()
    packed, n_reads = _e2e_reads()
    out = {"n_reads": n_reads}
    dpar = ClassifyParams(thresholds=[0.0], per_read_output=True)
    saved_hr = os.environ.get("STPU_HIT_RUNS")
    try:
        for label, hr in (
            ("detailed_dense_native", "0"), ("detailed_hitruns", "1")
        ):
            os.environ["STPU_HIT_RUNS"] = hr
            cls = Classifier(IDX, probe="hashed1", packed_transfer=True)
            loc = tempfile.mkdtemp(prefix="stpu_e2e12_")
            try:
                cls.classify_and_write_packed(packed[:1], loc + "/warm", dpar)
                best = 0.0
                for t in range(3):
                    t0 = time.time()
                    cls.classify_and_write_packed(packed, loc + f"/t{t}", dpar)
                    best = max(best, n_reads / (time.time() - t0))
                out[f"{label}_reads_s"] = round(best)
            finally:
                shutil.rmtree(loc, ignore_errors=True)
    finally:
        if saved_hr is None:
            os.environ.pop("STPU_HIT_RUNS", None)
        else:
            os.environ["STPU_HIT_RUNS"] = saved_hr
    return out


@guard("build_wide_dr")
def exp_build_wide_dr():
    """Wide (m=33) device-resident build->serve (r5: _scan_batch_records_
    kernel_wide + _reduce_chunks_kernel_wide + build_hashed_rows_wide_
    device): warm wide build Mbp/s with records + serve table staying on
    device, vs the host-materializing wide build; classify sanity through
    hashed1_wide straight from the device-resident index."""
    import importlib.util as _ilu

    from slacken_tpu.index import IndexParams
    from slacken_tpu.taxonomy import Taxonomy

    spec = _ilu.spec_from_file_location("bench", "/root/repo/bench.py")
    bench = _ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)
    nodes = [(1, 1, "root"), (455631, 1, "species"),
             (526997, 1, "species"), (9606, 1, "species")]
    tax = Taxonomy.from_nodes_and_names(
        nodes, [(t, f"taxon{t}") for t, _, _ in nodes]
    )
    out = {}
    # CPU shakeouts can't afford the full 8 Mbp wide build (the 4-limb
    # sort is TPU-shaped); STPU_WDR_FRAC scales the library down
    frac = float(os.environ.get("STPU_WDR_FRAC", "1"))
    mbp = 8.0 * frac

    def fresh_build():
        lib = (
            (t_, s[: max(1 << 12, int(len(s) * frac))])
            for t_, s in bench.synthetic_library(np.random.default_rng(20260816))
        )
        return KeyValueIndex.build(
            lib, IndexParams(k=45, m=33, spaces=7), tax,
            batch_rows=32, row_len=1 << 16,
        )

    saved = {
        k_: os.environ.get(k_)
        for k_ in ("STPU_DEVICE_RESIDENT", "STPU_BUILD_DEVICE")
    }
    os.environ["STPU_BUILD_DEVICE"] = "1"
    try:
        os.environ["STPU_DEVICE_RESIDENT"] = "1"
        fresh_build()  # warm compiles
        t0 = time.time()
        idx = fresh_build()
        dt = time.time() - t0
        out["wide_dr_warm_s"] = round(dt, 2)
        out["wide_dr_warm_mbp_s"] = round(mbp / dt, 2)
        out["wide_dr_records"] = idx.num_records
        t0 = time.time()
        table, tile, rb = idx.device_hashed_rows
        jax.block_until_ready(table)
        out["serve_table_s"] = round(time.time() - t0, 2)
        out["serve_table_MB"] = round(table.nbytes / 1e6, 1)
        cls = Classifier(idx, probe="hashed1")
        packed, n_reads = _e2e_reads()
        import shutil
        import tempfile

        loc = tempfile.mkdtemp(prefix="stpu_wdr_")
        try:
            cpar = ClassifyParams(thresholds=[0.0], per_read_output=False)
            cls.classify_and_write_packed(packed, loc + "/w", cpar)
            t0 = time.time()
            cls.classify_and_write_packed(packed, loc + "/t", cpar)
            out["wide_dr_classify_reads_s"] = round(n_reads / (time.time() - t0))
            rep = open(loc + "/t_c0.0/all_kreport.txt").read().splitlines()
            uncl = next(
                (int(l.split("\t")[1]) for l in rep if l.endswith("unclassified")),
                0,
            )
            out["wide_dr_classified"] = n_reads - uncl
        finally:
            shutil.rmtree(loc, ignore_errors=True)
        assert idx._keys is None, "serve path must not materialize host keys"
        t0 = time.time()
        k = idx.keys
        out["materialize_d2h_s"] = round(time.time() - t0, 2)
        out["materialize_records"] = len(k)
        os.environ["STPU_DEVICE_RESIDENT"] = "0"
        fresh_build()
        t0 = time.time()
        idx_h = fresh_build()
        dt = time.time() - t0
        out["wide_host_warm_s"] = round(dt, 2)
        out["wide_host_warm_mbp_s"] = round(mbp / dt, 2)
        out["identical"] = bool(np.array_equal(idx_h.keys, k))
    finally:
        for k_, v in saved.items():
            if v is None:
                os.environ.pop(k_, None)
            else:
                os.environ[k_] = v
    return out


if __name__ == "__main__":
    steps = {
        "transfer": exp_transfer,
        "load_index": exp_load_index,
        "scan": exp_scan,
        "probe": exp_probe,
        "kernel": exp_kernel,
        "batch_sweep": exp_batch_sweep,
        "e2e": exp_e2e,
        "bracken": exp_bracken,
        "build": exp_build,
        "roofline": exp_roofline,
        "probe2": exp_probe2,
        "kernel2": exp_kernel2,
        "components2": exp_components2,
        "components3": exp_components3,
        "pallas_probe": exp_pallas_probe,
        "e2e2": exp_e2e2,
        "bench2": exp_bench2,
        "components4": exp_components4,
        "e2e3": exp_e2e3,
        "probe3": exp_probe3,
        "kernel3": exp_kernel3,
        "e2e4": exp_e2e4,
        "build2": exp_build2,
        "scale_build": exp_scale_build_tpu,
        "scale_classify": exp_scale_classify_tpu,
        "e2e5": exp_e2e5,
        "probe4": exp_probe4,
        "kernel4": exp_kernel4,
        "e2e6": exp_e2e6,
        "build4": exp_build4,
        "build5": exp_build5,
        "kernel5": exp_kernel5,
        "e2e7": exp_e2e7,
        "e2e8": exp_e2e8,
        "e2e9": exp_e2e9,
        "e2e10": exp_e2e10,
        "scale_classify2": exp_scale_classify2,
        "bench_warm": exp_bench_warm,
        "build6": exp_build6,
        "build7": exp_build7,
        "build_dr": exp_build_dr,
        "build_dr2": exp_build_dr2,
        "kernel6": exp_kernel6,
        "e2e11": exp_e2e11,
        "e2e12": exp_e2e12,
        "build_wide_dr": exp_build_wide_dr,
    }
    # argv order is honored so risky experiments can be sequenced LAST
    # (roofline killed the tunnel in sessions 2 and 3); unknown names are
    # recorded and skipped — a typo must not burn the tunnel window
    names = sys.argv[1:] or list(steps)
    for name in names:
        fn = steps.get(name)
        if fn is None:
            record(name, ok=False, error=f"unknown experiment {name!r}")
            continue
        fn()
    # STPU_HOLD: keep the (single-client) tunnel alive and poll a command
    # file for follow-up experiments — a second session would otherwise pay
    # the 20-60 min tunnel recovery window. Append experiment names (one
    # per line) to the file; "quit" ends the session. Lines may set one-shot
    # env as NAME@K=V,K=V.
    hold = os.environ.get("STPU_HOLD")
    if hold:
        seen = 0
        print(f"[hold] polling {hold} for experiment names...", file=sys.stderr)
        while True:
            time.sleep(10)
            try:
                lines = [
                    l.strip() for l in open(hold).read().splitlines() if l.strip()
                ]
            except OSError:
                continue
            for line in lines[seen:]:
                seen += 1
                if line == "quit":
                    record("done", ok=True)
                    print(json.dumps(results, indent=2, default=str))
                    sys.exit(0)
                name, _, envspec = line.partition("@")
                saved = {}
                if envspec:
                    for kv in envspec.split(","):
                        k, _, v = kv.partition("=")
                        saved[k] = os.environ.get(k)
                        os.environ[k] = v
                fn = steps.get(name)
                if fn is None:
                    record(name, ok=False, error=f"unknown experiment {name!r}")
                else:
                    fn()
                for k, v in saved.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
    record("done", ok=True)
    print(json.dumps(results, indent=2, default=str))
