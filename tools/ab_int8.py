"""In-model A/B of the int8 serving path (ops/quant.py, CRIS_INT8 gate):
full fold_bn eval forward at b32, one arm per quantized-site family so
each family's contribution is isolated (VERDICT r4 task 3).

Arms (--settings comma list):
  0              bf16 (all int8 off)
  1              dynamic per-dispatch activation scales
  static         the production serving config (tracks the model's
                 defaults: QuantConv + pooled + s2d-stem + phase-form
                 upsample-fold since the round-5 flip)
  static_phase   static with upsample-fold (phase form) force-ON --
                 identical to `static` since the default flip; kept so
                 recorded runs stay comparable
  static_base    QuantConv (min_ch-gated backbone convs) ONLY
  static_pooled  base + pooled-k2s2 sites
  static_stem    base + s2d-stem sites
  static_r4      base + pooled + stem (the exact round-4 landed config;
                 reproduces BENCH_r04's 998.2 arm) == static_noupfold
  static_nohead  production minus the FPN/projector head-conv family

Run AFTER tools/bench_int8.py / bench_int8_more.py (per-shape microbench)
confirms the int8 conv wins standalone; this is the decisive number.

    PYTHONPATH=/root/repo:/root/.axon_site timeout 3300 \
        python tools/ab_int8.py [--batch 32] [--min-ch 64] \
            [--settings 0,static_base,static_pooled,static_stem,static_r4,static]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# env deltas per arm, applied on top of a cleared int8 environment
ARMS = {
    "0": {"CRIS_INT8": "0"},
    "1": {"CRIS_INT8": "1"},
    "static": {"CRIS_INT8": "1", "CRIS_INT8_STATIC": "1"},
    "static_base": {"CRIS_INT8": "1", "CRIS_INT8_STATIC": "1",
                    "CRIS_INT8_POOLED_MIN_CH": "999999",
                    "CRIS_INT8_STEM": "0", "CRIS_INT8_UPFOLD": "0",
                    "CRIS_INT8_HEAD": "0"},
    "static_pooled": {"CRIS_INT8": "1", "CRIS_INT8_STATIC": "1",
                      "CRIS_INT8_STEM": "0", "CRIS_INT8_UPFOLD": "0",
                      "CRIS_INT8_HEAD": "0"},
    "static_stem": {"CRIS_INT8": "1", "CRIS_INT8_STATIC": "1",
                    "CRIS_INT8_POOLED_MIN_CH": "999999",
                    "CRIS_INT8_UPFOLD": "0", "CRIS_INT8_HEAD": "0"},
    "static_r4": {"CRIS_INT8": "1", "CRIS_INT8_STATIC": "1",
                  "CRIS_INT8_UPFOLD": "0", "CRIS_INT8_HEAD": "0"},
    # r4 + the upsample-fold family via the PHASE decomposition (won
    # in-model 954.8 -> 988.6 img/s and is now the production default;
    # the direct ld2 int8 form had measured -34 img/s)
    "static_phase": {"CRIS_INT8": "1", "CRIS_INT8_STATIC": "1",
                     "CRIS_INT8_UPFOLD": "1", "CRIS_INT8_HEAD": "0"},
    # production minus the FPN/projector head-conv family (round-5
    # int8-mode audit follow-up): isolates the head sites' contribution
    "static_nohead": {"CRIS_INT8": "1", "CRIS_INT8_STATIC": "1",
                      "CRIS_INT8_HEAD": "0"},
}
ARMS["static_noupfold"] = ARMS["static_r4"]
# every knob any arm touches, cleared before each arm is applied
_KNOBS = sorted({k for d in ARMS.values() for k in d})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--min-ch", type=int, default=64)
    ap.add_argument("--preset", default="RN50")
    ap.add_argument("--settings", default="0,1,static")
    args = ap.parse_args()

    import jax

    import bench
    from tools._bench_common import marginal, probe

    bench.BATCH = args.batch
    os.environ["CRIS_INT8_MIN_CH"] = str(args.min_ch)
    print("devices:", jax.devices(), flush=True)
    probe()

    results = {}
    for i, setting in enumerate(args.settings.split(",")):
        for k in _KNOBS:
            os.environ.pop(k, None)
        os.environ.update(ARMS[setting])
        timed = bench.make_eval_bench(args.preset)
        results[setting] = marginal(
            timed, f"eval int8={setting}", batch=args.batch,
            seed_base=1000 + 137 * i)
    names = {"0": "off", "1": "dyn"}
    summary = "  ".join(
        f"{names.get(k, k)} {v[0]:.2f}ms ({v[1]:.1f} img/s)"
        for k, v in results.items())
    print(f"\nEVAL INT8 RESULT ({args.preset} min_ch={args.min_ch}): "
          f"{summary}\n", flush=True)
    for k in _KNOBS:
        os.environ.pop(k, None)


if __name__ == "__main__":
    main()
