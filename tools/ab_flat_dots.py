"""In-model A/B of the token-flattened projection dots (layers.token_flat).

The round-5 train audit showed the 3D-batched projection dots running at
77-108 TF/s standalone while the mathematically identical flattened 2D
form runs at ~190-198 (bench_int8_dot): ~16 ms of the train step and
~2 ms of the eval step. token_flat reshapes (B, S, E) -> (B*S, E) around
every decoder/attnpool/text-encoder Dense, auto-gated on dtype != f32;
CRIS_FLAT_DOTS=0/1 overrides. This measures both eval and train.

    PYTHONPATH=/root/repo:/root/.axon_site timeout 3300 \
        python tools/ab_flat_dots.py [--batch 32] [--modes eval,train]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--preset", default="RN50")
    ap.add_argument("--modes", default="eval,train")
    args = ap.parse_args()

    import jax

    import bench
    from tools._bench_common import env_ab, probe

    bench.BATCH = args.batch
    print("devices:", jax.devices(), flush=True)
    probe()

    for mode in args.modes.split(","):
        make = (bench.make_eval_bench if mode == "eval"
                else bench.make_train_bench)
        results = env_ab(
            "CRIS_FLAT_DOTS", ("0", "1"),
            lambda: make(args.preset), batch=args.batch, label=mode)
        summary = "  ".join(
            f"flat={k} {v[0]:.2f}ms ({v[1]:.1f} img/s)"
            for k, v in results.items())
        print(f"\n{mode.upper()} FLAT-DOTS RESULT ({args.preset} "
              f"b{args.batch}): {summary}\n", flush=True)


if __name__ == "__main__":
    main()
