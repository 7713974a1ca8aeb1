"""Round-5 TPU measurement queue runner (VERDICT r4 tasks 1/3/4/8 + 2).

Same discipline as tools/run_backlog_r4.py: ONE long-lived process
(first dispatch of each new process can stall 5-23 minutes; batching
pays it once), extended probe loop first, per-tool exception trapping,
caches cleared between tools.

Queues (pick with ``python tools/run_backlog_r5.py A`` / ``B`` / tool
names):

A (int8 attribution + open questions, ~2-4h):
  1. ab_int8 6-arm family attribution (base/pooled/stem/r4/full) --
     pins 952.8->998.2 per family AND measures the new upsample-fold
     quant path in-model (VERDICT tasks 1+3).
  2. bench_int8_more -- the per-shape ld2 rows (does XLA's TPU int8
     conv path run lhs_dilation at MXU rate?).
  3. ab_int8 RN101 (R101 int8-static, task 3 tail).
  4. bench_int8_dot -- decoder/attnpool dot_generals (task 8).

B (serving sweep + bwd audit, ~2-4h):
  5. bench_batch_sweep b16..128 bf16+int8 + train b64 (task 4).
  6. conv_audit --mode train -- the bwd per-op table (task 2).

    PYTHONPATH=/root/repo:/root/.axon_site timeout 10700 \
        python tools/run_backlog_r5.py A
"""

import gc
import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUEUES = {
    "A": [
        ("tools.ab_int8",
         ["--settings", "0,static_base,static_pooled,static_stem,"
          "static_r4,static"]),
        ("tools.bench_int8_more", []),
        ("tools.ab_int8#rn101", ["--preset", "RN101",
                                 "--settings", "0,static"]),
        ("tools.bench_int8_dot", []),
    ],
    "B": [
        ("tools.bench_upfold_phase", []),
        ("tools.bench_batch_sweep", []),
        ("tools.conv_audit#train", ["--mode", "train", "--no-model"]),
    ],
    # round-5 second wave: the corrected (bilinear) phase microbench,
    # the token-flattened-dots in-model A/B (eval + train), and the
    # phase-form int8 in-model arm
    "C": [
        ("tools.bench_upfold_phase", []),
        ("tools.ab_flat_dots", []),
        ("tools.ab_int8#phase", ["--settings", "0,static,static_phase"]),
    ],
}


def main():
    sel = sys.argv[1:] or ["A"]
    tools = []
    for s in sel:
        if s in QUEUES:
            tools.extend(QUEUES[s])
        else:
            for q in QUEUES.values():
                tools.extend(t for t in q if t[0].split(".")[-1]
                             .split("#")[0] == s)
    t_start = time.monotonic()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cris_tpu import cli

    cli.setup_compilation_cache()
    print("devices:", jax.devices(), flush=True)

    rng = np.random.RandomState(0)
    for i in range(5):
        t0 = time.monotonic()
        x = jnp.asarray(rng.randn(512, 512).astype(np.float32))
        float((x @ x).sum())
        print(f"backlog probe {i}: {time.monotonic() - t0:.1f}s", flush=True)

    failures = []
    for modname, argv in tools:
        modname, _, tag = modname.partition("#")
        short = modname.split(".")[-1] + (f"[{tag}]" if tag else "")
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

    print(f"\n{'=' * 70}\nR5 QUEUE DONE in {time.monotonic() - t_start:.0f}s; "
          f"{len(failures)} failure(s)", flush=True)
    for name, err in failures:
        print(f"  FAILED {name}: {err}", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
