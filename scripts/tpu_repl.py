#!/usr/bin/env python
"""Persistent TPU job runner: hold the single-client axon tunnel open and
execute queued job files, so a round's experiments cost ONE tunnel
connection instead of one per batch (the tunnel drops for 20-60 min after
any client exits — see CLAUDE.md).

Protocol (filesystem, no sockets):
  * drop `NNN_name.py` files into .tpu_jobs/ — executed in sorted order in a
    SHARED module namespace (state like a loaded index persists across jobs);
  * stdout/stderr of each job is captured to .tpu_jobs/done/<name>.out, plus
    an `ok`/`error` status line in .tpu_jobs/done/<name>.json;
  * a job file whose name contains "QUIT" makes the runner exit after
    running it (remember: the tunnel then drops for its recovery window);
  * the runner exits on its own after STPU_REPL_MAX_S (default 6h) so a
    forgotten runner cannot block the driver's end-of-round bench.

Jobs get helpers in scope: `jax`, `jnp`, `np`, `record(name, **kv)` (appends
to the job's json), and `RESULTS` (dict persisted per job).
"""

import io
import json
import os
import sys
import time
import traceback

JOBS = "/root/repo/.tpu_jobs"
DONE = os.path.join(JOBS, "done")
MAX_S = float(os.environ.get("STPU_REPL_MAX_S", 6 * 3600))
INIT_RETRY_S = float(os.environ.get("STPU_REPL_INIT_RETRY_S", 120))
INIT_WINDOW_S = float(os.environ.get("STPU_REPL_INIT_WINDOW_S", 4500))


def log(msg):
    print(f"[repl {time.strftime('%T')}] {msg}", file=sys.__stderr__, flush=True)


def main():
    os.makedirs(DONE, exist_ok=True)
    sys.path.insert(0, "/root/repo")

    import jax

    if os.environ.get("STPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["STPU_PLATFORM"])

    deadline = time.time() + INIT_WINDOW_S
    dev = None
    while dev is None:
        try:
            dev = jax.devices()[0]
        except RuntimeError as e:
            if time.time() > deadline:
                log(f"giving up on backend init: {e}")
                sys.exit(2)
            log(f"backend unavailable ({str(e)[:120]}); retrying in {INIT_RETRY_S:.0f}s")
            time.sleep(INIT_RETRY_S)
    if dev.platform != "cpu":
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    log(f"connected: {dev}")
    with open(os.path.join(JOBS, "DEVICE"), "w") as f:
        f.write(f"{dev}\n{os.getpid()}\n")

    import jax.numpy as jnp
    import numpy as np

    shared = {"jax": jax, "jnp": jnp, "np": np, "DEV": dev}
    t_end = time.time() + MAX_S
    while time.time() < t_end:
        pending = sorted(
            f for f in os.listdir(JOBS) if f.endswith(".py") and
            os.path.isfile(os.path.join(JOBS, f))
        )
        if not pending:
            time.sleep(2)
            continue
        name = pending[0]
        path = os.path.join(JOBS, name)
        with open(path) as f:
            code = f.read()
        os.rename(path, os.path.join(DONE, name))
        log(f"running {name}")
        results = {"started": time.strftime("%F %T")}
        out_path = os.path.join(DONE, name[:-3] + ".json")

        def record(key, **kv):
            results[key] = kv
            with open(out_path, "w") as f:
                json.dump(results, f, indent=1, default=str)
            log(f"  {key}: {json.dumps(kv, default=str)[:300]}")

        shared["record"] = record
        shared["RESULTS"] = results
        buf = io.StringIO()
        t0 = time.time()
        old_out, old_err = sys.stdout, sys.stderr
        try:
            sys.stdout = sys.stderr = _Tee(buf, sys.__stderr__)
            exec(compile(code, name, "exec"), shared)
            results["ok"] = True
        except BaseException as e:  # noqa: BLE001 — a job must not kill the runner
            results["ok"] = False
            results["error"] = f"{type(e).__name__}: {e}"
            traceback.print_exc()
            if isinstance(e, (KeyboardInterrupt, SystemExit)):
                pass  # recorded; keep the tunnel alive regardless
        finally:
            sys.stdout, sys.stderr = old_out, old_err
        results["wall_s"] = round(time.time() - t0, 2)
        with open(os.path.join(DONE, name[:-3] + ".out"), "w") as f:
            f.write(buf.getvalue())
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1, default=str)
        log(f"finished {name}: ok={results['ok']} ({results['wall_s']}s)")
        if "QUIT" in name:
            break
    log("runner exiting (tunnel will drop for its recovery window)")


class _Tee:
    def __init__(self, *streams):
        self.streams = streams

    def write(self, s):
        for st in self.streams:
            st.write(s)
        return len(s)

    def flush(self):
        for st in self.streams:
            st.flush()


if __name__ == "__main__":
    main()
