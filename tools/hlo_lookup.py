"""Map profiled fusion names back to their HLO definitions.

tools/profile_train_step.py names the train step's hot ops
(fusion.1903, multiply_reduce_fusion.22, ...) but generic fusion names
say nothing. This compiles the SAME train_step program (remote-compile
cache makes this cheap after a profile run) and prints each requested
fusion's fused computation from the optimized HLO -- operand shapes,
root expression -- so the profile becomes actionable.

    PYTHONPATH=/root/repo:/root/.axon_site timeout 3300 \
        python tools/hlo_lookup.py fusion.1903 multiply_reduce_fusion.22

With no names: prints the 25 largest fused computations by line count.
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--preset", default="RN50")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--max-lines", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from cris_tpu.engine.trainer import (
        create_train_state,
        make_optimizer,
        train_step,
    )
    from cris_tpu.utils import root_key
    from cris_tpu.utils.config import CfgNode
    from tools._bench_common import probe

    print("devices:", jax.devices(), flush=True)
    probe()

    model, variables = bench.build_model(args.preset, fold_bn=False)
    cfg = CfgNode({"base_lr": 1e-4, "lr_multi": 0.1, "milestones": [35],
                   "lr_decay": 0.1, "weight_decay": 0.0, "max_norm": 0.0})
    state = create_train_state(model, variables, make_optimizer(cfg, 1000))
    state = jax.device_put(state)
    rng = root_key(42)

    b = args.batch
    k = jax.random.PRNGKey(0)
    ki, kw, km = jax.random.split(k, 3)
    batch = {
        "image": jax.random.normal(ki, (b, 416, 416, 3), jnp.float32),
        "word": jax.random.randint(kw, (b, 17), 1, 49000, jnp.int32),
        "mask": (jax.random.uniform(km, (b, 416, 416, 1)) > 0.5
                 ).astype(jnp.float32),
    }

    import time

    t0 = time.monotonic()
    compiled = (jax.jit(train_step, donate_argnums=(0,))
                .lower(state, batch, rng).compile())
    print(f"compile: {time.monotonic() - t0:.1f}s", flush=True)
    txt = compiled.as_text()
    print(f"HLO text: {len(txt) / 1e6:.1f} MB", flush=True)

    # instruction line: %fusion.1903 = ... fusion(...), calls=%fused_computation.N
    # computation block: "%fused_computation.N (...) -> ... {" ... "}"
    def find_instr(name):
        m = re.search(
            rf"^\s*(?:ROOT )?%?{re.escape(name)} = .*$", txt, re.M)
        return m.group(0).strip() if m else None

    def find_computation(comp_name):
        m = re.search(
            rf"^(?:%?{re.escape(comp_name)}) .*?\{{(.*?)^\}}", txt,
            re.M | re.S)
        return m.group(0) if m else None

    names = args.names
    if not names:
        sizes = [(len(body.splitlines()), nm) for nm, body in
                 re.findall(r"^%?(\S*fused_computation\S*) [^\n]*\{(.*?)^\}",
                            txt, re.M | re.S)]
        for n, nm in sorted(sizes, reverse=True)[:25]:
            print(f"  {n:5d} lines  {nm}")
        return

    for name in names:
        print(f"\n{'=' * 70}\n== {name}\n{'=' * 70}", flush=True)
        instr = find_instr(name)
        if instr is None:
            print("  NOT FOUND")
            continue
        print(instr[:2000])
        m = re.search(r"calls=%?([\w\.\-]+)", instr)
        if m:
            body = find_computation(m.group(1))
            if body:
                lines = body.splitlines()
                head = lines[: args.max_lines]
                print("\n".join("  " + ln for ln in head))
                if len(lines) > args.max_lines:
                    print(f"  ... (+{len(lines) - args.max_lines} lines)")


if __name__ == "__main__":
    main()
