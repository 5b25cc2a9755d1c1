#!/usr/bin/env python
"""Benchmark: classify testData/ERR599052_10k.fastq against a mini-library
(BASELINE.json config 1). Prints ONE JSON line with reads/sec/chip.

The reference's bundled tiny library genomes (slacken_tinydata.fna: taxa
455631, 526997, 9606; ~8.5 Mbp total per its .fai) are not shipped in the
repo, so a deterministic synthetic library of the same scale and taxon
structure stands in. The workload shape matches the reference path: index
resident, 10k real Illumina reads, k=35 m=31 s=7, reports mode.

vs_baseline compares against 15,000 reads/s — a Kraken 2-class single
CPU-core throughput estimate for 100bp reads (the reference publishes no
absolute throughput numbers; README.md:563-565 defers to the NAR paper).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_READS_PER_SEC = 15000.0


def _mark(phase: str):
    """Heartbeat for the supervisor: a progress mark proves the inner run is
    alive (compiling/transferring), so only a genuine stall gets killed."""
    path = os.environ.get("STPU_BENCH_PROGRESS")
    if path:
        try:
            with open(path, "a") as f:
                f.write(f"{time.time():.0f} {phase}\n")
        except OSError:
            pass
    print(f"[bench {time.strftime('%T')}] {phase}", file=sys.stderr, flush=True)


def synthetic_library(rng):
    # sized like testData/slacken/slacken_tinydata.fna.fai: three genomes
    sizes = {455631: 4_100_000, 526997: 3_100_000, 9606: 800_000}
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    for taxon, n in sizes.items():
        seq = lut[rng.integers(0, 4, n)].tobytes().decode("ascii")
        yield taxon, seq


RC_TUNNEL_DOWN = 3  # retryable: the supervisor waits out the recovery window


def _load_reads():
    """The bench workload: 10k real Illumina reads + 10k simulated from the
    library (1% mutations), 4x replicated for steady-state measurement."""
    from slacken_tpu import native
    from slacken_tpu.inputs import packed_reads_from_file
    from slacken_tpu.ops import encode as enc

    packed = list(packed_reads_from_file("/root/reference/testData/ERR599052_10k.fastq"))
    sim_rng = np.random.default_rng(7)
    sim = []
    for taxon, seq in synthetic_library(np.random.default_rng(20260816)):
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
    return (packed + sim) * 4


CPU_RATE_CACHE = "/root/repo/.bench_cache/cpu_rate.json"
INDEX_CACHE = "/root/repo/.bench_cache/idx"


def _bench_taxonomy():
    from slacken_tpu.taxonomy import Taxonomy

    nodes = [(1, 1, "root"), (455631, 1, "species"), (526997, 1, "species"), (9606, 1, "species")]
    return Taxonomy.from_nodes_and_names(nodes, [(t, f"taxon{t}") for t, _, _ in nodes])


def _bench_index_params():
    from slacken_tpu.index import IndexParams

    return IndexParams(k=35, m=31, spaces=7)


def _fresh_build(tax):
    """The bench's index build, shared verbatim by the classify-index cache,
    the build benchmark, and the CPU comparator — so every number measures
    the SAME workload."""
    from slacken_tpu.index import KeyValueIndex

    return KeyValueIndex.build(
        synthetic_library(np.random.default_rng(20260816)),
        _bench_index_params(),
        tax,
        batch_rows=32,
        row_len=1 << 16,
    )


def _load_or_build_index(tax):
    from slacken_tpu.index import KeyValueIndex

    if os.path.exists(os.path.join(INDEX_CACHE, "params.json")):
        return KeyValueIndex.load(INDEX_CACHE), True
    idx = _fresh_build(tax)
    idx.save(INDEX_CACHE)
    return idx, False


def comparator():
    """Forced-CPU measurement of the same classify workload — the honest
    measured comparator for vs_cpu (VERDICT r4 #6: vs_baseline alone rests
    on an estimated Kraken-2-core constant). Writes CPU_RATE_CACHE."""
    _mark("cpu comparator start")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from slacken_tpu import utils as stpu_utils
    from slacken_tpu.classify import Classifier, ClassifyParams

    stpu_utils.set_heartbeat(_mark)
    tax = _bench_taxonomy()
    idx, _ = _load_or_build_index(tax)
    packed = _load_reads()
    n_reads = sum(len(p) for p in packed)
    cpar = ClassifyParams(thresholds=[0.0], per_read_output=False)
    import shutil
    import tempfile

    cls = Classifier(idx)
    outdir = tempfile.mkdtemp(prefix="stpu_benchcpu_")
    best = 0.0
    try:
        cls.classify_and_write_packed(packed, outdir + "/warm", cpar)
        _mark("cpu warm done")
        for trial in range(2):
            t0 = time.time()
            cls.classify_and_write_packed(packed, outdir + f"/t{trial}", cpar)
            rate = n_reads / (time.time() - t0)
            best = max(best, rate)
            _mark(f"cpu trial {trial} {rate:.0f} reads/s")
    finally:
        shutil.rmtree(outdir, ignore_errors=True)
    os.makedirs(os.path.dirname(CPU_RATE_CACHE), exist_ok=True)
    with open(CPU_RATE_CACHE, "w") as f:
        json.dump({"cpu_reads_per_sec": round(best, 1), "time": time.time()}, f)
    print(f"cpu comparator: {best:.0f} reads/s", file=sys.stderr)


def _cpu_comparator_rate():
    """Measured CPU rate: from a recent cache, else measured now in a
    forced-CPU subprocess (it never touches the axon tunnel — the platform
    is pinned in code, see memory: axon ignores JAX_PLATFORMS)."""
    try:
        with open(CPU_RATE_CACHE) as f:
            d = json.load(f)
        if time.time() - d.get("time", 0) < 48 * 3600:
            return d["cpu_reads_per_sec"]
    except (OSError, ValueError, KeyError):
        pass
    import subprocess

    _mark("slow:cpu comparator subprocess")
    try:
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--comparator"],
            timeout=float(os.environ.get("STPU_BENCH_CPU_CMP_TIMEOUT", 900)),
            check=True,
        )
        with open(CPU_RATE_CACHE) as f:
            return json.load(f)["cpu_reads_per_sec"]
    except Exception as e:  # comparator is best-effort; never sink the bench
        print(f"cpu comparator failed: {e}", file=sys.stderr)
        return None


def main(force_cpu: bool = False):
    _mark("start")
    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from slacken_tpu.classify import Classifier, ClassifyParams, Fragment

    # persistent compile cache: TPU only (XLA:CPU AOT cache entries can load
    # across machine-feature mismatches and silently corrupt results)
    try:
        if jax.devices()[0].platform != "cpu":
            jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except RuntimeError:
        pass
    try:
        dev = jax.devices()[0]
    except RuntimeError as e:
        if not force_cpu:
            # The TPU attempt must NEVER record a CPU number as its result:
            # exit retryable so the supervisor can wait out the tunnel's
            # 20-60 min recovery window (VERDICT r2 weak #1).
            print(f"TPU backend unavailable: {e}", file=sys.stderr)
            sys.exit(RC_TUNNEL_DOWN)
        jax.config.update("jax_platforms", "cpu")
        dev = jax.devices()[0]
    if not force_cpu and dev.platform == "cpu":
        print("TPU attempt resolved to a CPU device; retrying later", file=sys.stderr)
        sys.exit(RC_TUNNEL_DOWN)
    _mark(f"device {dev}")
    print(f"device: {dev}", file=sys.stderr)

    # liveness marks from inside the pipeline: the first dispatch per shape
    # blocks in an XLA compile for minutes over the axon tunnel (BENCH_r04
    # attempts 1-2 were killed mid-warm); "slow:" marks tell the supervisor
    # to apply the slow allowance instead of the stall timeout
    from slacken_tpu import utils as stpu_utils

    stpu_utils.set_heartbeat(_mark)

    tax = _bench_taxonomy()
    idx, cached = _load_or_build_index(tax)
    print(
        f"index {'loaded from cache' if cached else 'built'}: "
        f"{idx.num_records} records",
        file=sys.stderr,
    )
    _mark("index ready")

    # real reads via the native packed fast path, plus an equal volume of
    # reads simulated from the library so the resolve/report paths see
    # realistic classified fractions, 4x replicated for steady state
    packed = _load_reads()
    n_reads = sum(len(p) for p in packed)
    _mark(f"{n_reads} reads loaded")
    print(
        f"{n_reads} reads loaded (10k real + 10k simulated, 4x replicated)",
        file=sys.stderr,
    )

    cpar = ClassifyParams(thresholds=[0.0], per_read_output=False)

    # reports-only production path (the reference's SQL classifier,
    # Classifier.scala:259-410): streaming (sample, taxon) aggregation, no
    # per-read objects materialised. Probe + batch size are the measured
    # platform defaults (r4_session1 e2e6: single-gather hashed1 @ 4 Mbp =
    # 228.4k reads/s on the v5e; routed @ 1 Mbp on CPU) — Classifier picks
    # them itself.
    import shutil
    import tempfile

    cls = Classifier(idx)
    outdir = tempfile.mkdtemp(prefix="stpu_bench_")
    best = 0.0
    try:
        # warm = one FULL pass: identical shapes AND pipeline depth to a
        # trial, so trial 0 runs at steady state (BENCH_r04 trial 0 paid
        # ~2 s of tail-shape compiles + pipeline fill that packed[:1]
        # warming never exercised)
        cls.classify_and_write_packed(packed, outdir + "/warm", cpar)
        _mark("warm")
        for trial in range(3):
            t0 = time.time()
            cls.classify_and_write_packed(packed, outdir + f"/t{trial}", cpar)
            dt = time.time() - t0
            rate = n_reads / dt
            best = max(best, rate)
            _mark(f"trial {trial} {rate:.0f} reads/s")
            print(
                f"trial {trial}: {dt:.2f}s = {rate:.0f} reads/s",
                file=sys.stderr,
            )
        report = open(outdir + "/t2_c0.0/all_kreport.txt").read().splitlines()
        uncl = next(
            (int(l.split("\t")[1]) for l in report if l.endswith("unclassified")), 0
        )
        print(f"classified: {n_reads - uncl}/{n_reads}", file=sys.stderr)
    finally:
        shutil.rmtree(outdir, ignore_errors=True)

    # second north-star metric (BASELINE.json): DB-build throughput — build
    # the classify library itself (8 Mbp / 3 genomes) fresh every run, so the
    # number measures the production build at a non-toy scale. The warmup
    # must run the FULL 8 Mbp shapes: a tiny warmup leaves the big-shape
    # executables to be compiled (or deserialized from the persistent cache)
    # inside the timed run — ~2-3 s of one-time cost that a production
    # multi-hour build would never see per batch (r4_session6 build6 trace).
    build_bp = 8_000_000
    _fresh_build(tax)
    _mark("build warm done")
    t0 = time.time()
    bidx = _fresh_build(tax)
    build_dt = time.time() - t0
    print(
        f"build: {bidx.num_records} records from {build_bp / 1e6:.0f} Mbp in "
        f"{build_dt:.1f}s = {build_bp / build_dt / 1e6:.2f} Mbp/s",
        file=sys.stderr,
    )
    if bidx.num_records != idx.num_records:
        print(
            f"WARNING: fresh build records {bidx.num_records} != cached {idx.num_records}",
            file=sys.stderr,
        )

    # measured comparator: this repo's own CPU backend on the same workload
    # (vs_baseline rests on an estimated Kraken-2-core constant; vs_cpu is
    # measured end to end — VERDICT r4 #6)
    cpu_rate = None if force_cpu else _cpu_comparator_rate()
    _mark("cpu comparator done")

    print(
        json.dumps(
            {
                "metric": "classify_reads_per_sec_per_chip",
                "value": round(best, 1),
                "unit": "reads/s",
                "vs_baseline": round(best / BASELINE_READS_PER_SEC, 3),
                "build_mbp_per_sec": round(build_bp / build_dt / 1e6, 2),
                "build_genomes_per_sec": round(3 / build_dt, 2),
                "cpu_reads_per_sec": cpu_rate,
                "vs_cpu": round(best / cpu_rate, 3) if cpu_rate else None,
            }
        )
    )


def _run_attempt(args, env, stall_s, hard_s):
    """Start one inner attempt; kill it only on a genuine stall (no progress
    mark for `stall_s` — or for the larger slow allowance while the last
    mark says "slow:", i.e. the inner process is knowingly blocked in an XLA
    compile / subprocess that takes minutes over the tunnel) or at the
    `hard_s` ceiling. Returns the exit code, or None if killed."""
    import subprocess
    import tempfile

    slow_s = float(os.environ.get("STPU_BENCH_TPU_SLOW", 1200))
    fd, progress = tempfile.mkstemp(prefix="stpu_bench_hb_")
    os.close(fd)
    env = dict(env, STPU_BENCH_PROGRESS=progress)
    child = subprocess.Popen([sys.executable, os.path.abspath(__file__)] + args, env=env)
    t0 = time.time()
    try:
        while True:
            try:
                return child.wait(timeout=10)
            except subprocess.TimeoutExpired:
                pass
            now = time.time()
            last = max(os.path.getmtime(progress), t0)
            allow = stall_s
            try:
                with open(progress, "rb") as f:
                    tail = f.read()[-4096:].decode(errors="replace").splitlines()
                if tail and "slow:" in tail[-1]:
                    allow = max(stall_s, slow_s)
            except OSError:
                pass
            if now - last > allow or now - t0 > hard_s:
                why = "stalled" if now - last > allow else "hit hard ceiling"
                print(
                    f"bench attempt {args} {why} after {now - t0:.0f}s; "
                    f"killing pid {child.pid}",
                    file=sys.stderr,
                )
                child.kill()
                child.wait()
                return None
    finally:
        try:
            os.unlink(progress)
        except OSError:
            pass


def _supervise():
    """Run the bench in a child process, resilient to the axon tunnel.

    Failure modes seen on this host (r2: BENCH_r02 regressed to CPU):
      * jax init or the first compile HANGS silently — handled by a
        heartbeat-based stall detector (progress marks from _mark), so a
        slow-but-alive cold compile is NOT killed;
      * init fails fast with UNAVAILABLE — the inner process exits
        RC_TUNNEL_DOWN and the supervisor sleeps and retries: the tunnel
        drops for 20-60 min after its previous client exits, so the retry
        budget must span that whole recovery window.
    Only after the TPU window is exhausted does a forced-CPU run produce the
    fallback JSON line. A healthy tunnel is untouched: the TPU attempt IS
    the real run (no separate probe process whose exit could drop the tunnel
    for the main run)."""

    t_total = float(os.environ.get("STPU_BENCH_TPU_TOTAL", 5400))
    t_stall = float(os.environ.get("STPU_BENCH_TPU_STALL", 420))
    t_hard = float(os.environ.get("STPU_BENCH_TPU_HARD", 2700))
    t_retry = float(os.environ.get("STPU_BENCH_RETRY_SLEEP", 150))
    t_cpu = float(os.environ.get("STPU_BENCH_CPU_TIMEOUT", 1800))

    deadline = time.time() + t_total
    attempt = 0
    while time.time() < deadline:
        attempt += 1
        print(f"TPU attempt {attempt}...", file=sys.stderr)
        rc = _run_attempt(["--inner"], os.environ, t_stall, t_hard)
        if rc == 0:
            return
        why = "killed" if rc is None else f"rc={rc}"
        remaining = deadline - time.time()
        print(
            f"TPU attempt {attempt} failed ({why}); {remaining:.0f}s left in window",
            file=sys.stderr,
        )
        if remaining > t_retry:
            time.sleep(t_retry)
    print("TPU window exhausted; falling back to CPU", file=sys.stderr)
    rc = _run_attempt(["--inner", "--cpu"], os.environ, t_cpu, t_cpu)
    sys.exit(0 if rc == 0 else 1)


if __name__ == "__main__":
    if "--comparator" in sys.argv:
        comparator()
    elif "--inner" in sys.argv:
        main(force_cpu="--cpu" in sys.argv)
    else:
        _supervise()
