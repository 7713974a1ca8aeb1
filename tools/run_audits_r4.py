"""Round-4 audit queue: conv MXU-efficiency tables + int8 per-site error
(VERDICT r3 tasks 4, 5, 3), one long-lived process (relay discipline).

    PYTHONPATH=/root/repo:/root/.axon_site timeout 10700 \
        python tools/run_audits_r4.py [job ...]

Jobs (default all): eval50 train50 eval101 int8err
"""

import gc
import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

JOBS = [
    ("s2d", "tools.bench_s2d", []),
    ("ab_s2d", "tools.ab_s2d", []),
    ("eval50", "tools.conv_audit", ["--preset", "RN50", "--mode", "eval"]),
    ("train50", "tools.conv_audit", ["--preset", "RN50", "--mode", "train"]),
    ("eval101", "tools.conv_audit", ["--preset", "RN101", "--mode", "eval"]),
    ("ab_int8", "tools.ab_int8", []),
    ("s2d_region", "tools.bench_s2d_region", []),
    ("prof_train", "tools.profile_eval", ["--train"]),
    ("prof_step", "tools.profile_train_step", []),
    ("ab_int8_64", "tools.ab_int8", ["--min-ch", "64"]),
    ("hlo", "tools.hlo_lookup",
     ["fusion.1903", "multiply_reduce_fusion.22", "fusion.1588",
      "fusion.6183", "multiply_reduce_fusion.4", "multiply_reduce_fusion.1",
      "multiply_reduce_fusion.2", "fusion.2", "fusion.1250",
      "convolution_convert_fusion.2", "convolution_convert_fusion.1",
      "add_add_fusion", "compare_convert_fusion", "select_multiply_fusion"]),
    ("int8err64", "tools.int8_error_audit",
     ["--static", "--min-ch", "64", "--mode", "compound", "--batch", "8"]),
    ("int8err_static", "tools.int8_error_audit",
     ["--static", "--mode", "compound", "--batch", "8"]),
    ("int8err_local", "tools.int8_error_audit",
     ["--static", "--mode", "local", "--batch", "8"]),
    ("int8err_pct", "tools.int8_error_audit",
     ["--static", "--pct", "99.9", "--mode", "compound", "--batch", "8"]),
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
    rng = np.random.RandomState(0)
    for i in range(5):
        t0 = time.monotonic()
        x = jnp.asarray(rng.randn(512, 512).astype(np.float32))
        float((x @ x).sum())
        print(f"audit probe {i}: {time.monotonic() - t0:.1f}s", flush=True)

    failures = []
    for job, modname, argv in JOBS:
        if only and job not in only:
            continue
        print(f"\n{'=' * 70}\n== {job}  (t+{time.monotonic() - t_start:.0f}s)"
              f"\n{'=' * 70}", flush=True)
        sys.argv = [job] + argv
        t0 = time.monotonic()
        try:
            mod = importlib.import_module(modname)
            mod.main()
        except SystemExit as e:
            if e.code:
                failures.append((job, f"exit {e.code}"))
        except Exception as e:  # noqa: BLE001 -- keep the queue alive
            import traceback

            traceback.print_exc()
            failures.append((job, repr(e)[:200]))
        print(f"== {job} done in {time.monotonic() - t0:.0f}s", flush=True)
        # env hygiene between jobs (int8_error_audit sets gates)
        for var in ("CRIS_INT8", "CRIS_INT8_STATIC", "CRIS_INT8_MIN_CH",
                    "CRIS_INT8_AUDIT", "CRIS_INT8_CALIB_PCT",
                    "CRIS_S2D_STEM"):
            os.environ.pop(var, None)
        jax.clear_caches()
        gc.collect()

    print(f"\nAUDITS DONE in {time.monotonic() - t_start:.0f}s; "
          f"{len(failures)} failure(s)", flush=True)
    for name, err in failures:
        print(f"  FAILED {name}: {err}", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
