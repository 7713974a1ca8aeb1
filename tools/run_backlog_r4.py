"""Round-4 TPU measurement backlog runner (VERDICT r3 task 1).

Runs the queued-but-never-measured tools sequentially in ONE long-lived
process (CLAUDE.md relay discipline: the first dispatch of each new
process can stall 5-23 minutes; batching pays that once). Per-tool
exception trapping so one failure doesn't kill the queue; caches cleared
between tools so a prior tool's compiled executables / device buffers
can't OOM a later train-program compile.

Order = VERDICT r3 priority: opt variants (feeds the train>=213 task),
upsample-fold A/B, int8 micro + in-model, TPU selfcheck. cache_check
cold/warm runs as two separate processes afterwards (that's its point).

    PYTHONPATH=/root/repo:/root/.axon_site timeout 10700 \
        python tools/run_backlog_r4.py [tool ...]
"""

import gc
import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOOLS = [
    ("tools.bench_opt_variants", []),
    ("tools.ab_fuse_upsample", []),  # eval+train (default)
    ("tools.bench_int8", []),
    ("tools.ab_int8", []),
    ("tools.tpu_selfcheck", []),
]


def main():
    only = set(sys.argv[1:])
    t_start = time.monotonic()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cris_tpu import cli

    cli.setup_compilation_cache()
    print("devices:", jax.devices(), flush=True)

    # Extended probe loop: absorb the first-contact relay stall before any
    # tool starts its own (shorter) probe.
    rng = np.random.RandomState(0)
    for i in range(5):
        t0 = time.monotonic()
        x = jnp.asarray(rng.randn(512, 512).astype(np.float32))
        float((x @ x).sum())
        print(f"backlog probe {i}: {time.monotonic() - t0:.1f}s", flush=True)

    failures = []
    for modname, argv in TOOLS:
        short = modname.split(".")[-1]
        if only and short not in only:
            continue
        print(f"\n{'=' * 70}\n== {short}  (t+{time.monotonic() - t_start:.0f}s)"
              f"\n{'=' * 70}", flush=True)
        sys.argv = [short] + argv
        t0 = time.monotonic()
        try:
            mod = importlib.import_module(modname)
            rc = mod.main()
            if rc:
                failures.append((short, f"exit code {rc}"))
        except Exception as e:  # noqa: BLE001 -- keep the queue alive
            import traceback

            traceback.print_exc()
            failures.append((short, repr(e)[:200]))
        print(f"== {short} done in {time.monotonic() - t0:.0f}s", flush=True)
        jax.clear_caches()
        gc.collect()

    print(f"\n{'=' * 70}\nBACKLOG DONE in {time.monotonic() - t_start:.0f}s; "
          f"{len(failures)} failure(s)", flush=True)
    for name, err in failures:
        print(f"  FAILED {name}: {err}", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
