"""Driver benchmark: one JSON line per metric, headline first.

Metrics (all batch 32, 416x416, bf16, per chip):
  1. cris_r50_eval_throughput_416px_b32  -- HEADLINE. The device eval path
     exactly as test.py uses it (BN folded into conv weights, sigmoid +
     bicubic align_corners=True upsample). vs_baseline = value/100:
     the reference publishes no throughput (SURVEY.md §6); 100 img/s is our
     recorded estimate of its batched A100 fp16 eval rate for CRIS-R50.
  2. cris_r50_train_throughput_416px_b32 -- full train step (fwd + bwd +
     two-group Adam + BN stats), the trainer.train_step program.
     vs_baseline = value/213: round-1 recorded rate, so the driver catches
     regressions mechanically (VERDICT round 1, Weak #7).
  3. cris_r101_eval_throughput_416px_b32 -- same eval path, RN101 backbone.
     vs_baseline = value/638 (round-1 recorded rate).
  4. host_input_pipeline_640x480 -- native C++ data plane, img/s on this
     host (decode+warp+normalize of 640x480 JPEGs to 416^2).
     vs_baseline = native/python-path rate: the speedup over the
     reference-style per-sample Python worker on the same cores.
  5. cris_r50_eval_int8_throughput_416px_b32 -- the opt-in int8 serving
     mode (static-calibrated activation scales, ops/quant.py); NOT the
     parity path (quantization error ~1%/conv). vs_baseline = value/100
     like metric 1. Round-5 family attribution (tools/ab_int8.py):
     bf16 876.6 -> QuantConv 938.8 -> +pooled/+s2d-stem 1000.2 img/s;
     + phase-form upsample-fold int8 measured +3.5% on top (954.8 ->
     988.6 same-session, now default via CRIS_INT8_UPFOLD=1).
  6. cris_r50_eval_int8_throughput_416px_b16 -- the same int8 path at the
     measured SERVING optimum batch (tools/bench_batch_sweep.py round 5:
     int8 peaks at b16 -- 1016.1 vs 999.5 b32 / 957.9 b64 -- and b16
     halves the per-request latency; PredictService default max_batch=16).

Methodology: each loop runs as ONE jitted lax.scan over n pre-generated
device-resident batches (how a production loop feeds a TPU), timed at two
scan lengths; throughput is the *marginal* rate B*(n2-n1)/(T2-T1). The
subtraction cancels the fixed per-dispatch cost, which on this development
machine is a ~30 ms relay-tunnel round trip rather than anything a TPU
host would pay.

Robustness: the relay can stall for minutes; the benchmark works under a
wall-clock deadline, probes for stalls before burning timing trials, and
ALWAYS prints the headline line -- a deadline-degraded amortized number if
the marginal measurement could not complete. Secondary metrics are emitted
only if they fit in the remaining budget (a missing line beats a garbage
number).
"""

import dataclasses
import json
import os
import sys
import time
from functools import partial


def _dbg(msg):
    if os.environ.get("CRIS_BENCH_DEBUG"):
        print(f"[bench +{time.monotonic() - START:7.1f}s] {msg}",
              file=sys.stderr, flush=True)

BATCH = 32
N_SHORT = 2
N_LONG = 12
DEADLINE_S = float(os.environ.get("CRIS_BENCH_DEADLINE", "1500"))
STALL_S = 30.0  # a 2-step scan normally returns in <1s; >30s = relay stall
START = time.monotonic()

BASELINES = {
    "cris_r50_eval_throughput_416px_b32": 100.0,   # est. reference A100 rate
    "cris_r50_train_throughput_416px_b32": 213.0,  # our round-1 rate
    "cris_r101_eval_throughput_416px_b32": 638.0,  # our round-1 rate
    # same A100-estimate denominator as the headline eval metric
    "cris_r50_eval_int8_throughput_416px_b32": 100.0,
    "cris_r50_eval_int8_throughput_416px_b16": 100.0,
}


def time_left():
    return DEADLINE_S - (time.monotonic() - START)


def emit(metric, step_ms, note=""):
    import jax

    img_per_sec = BATCH / (step_ms / 1000.0) / max(1, jax.device_count())
    result = {
        "metric": metric,
        "value": round(img_per_sec, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(img_per_sec / BASELINES[metric], 3),
    }
    if note:
        result["note"] = note
    print(json.dumps(result), flush=True)


def build_model(preset_name, fold_bn):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cris_tpu.checkpoint import fold_batchnorm
    from cris_tpu.models import CLIP_PRESETS, CRIS

    fpn_in = {"RN50": (512, 1024, 1024), "RN101": (512, 1024, 512)}[preset_name]
    model = CRIS(
        clip_config=CLIP_PRESETS[preset_name],
        fpn_in=fpn_in,
        fpn_out=(256, 512, 1024),
        vis_dim=512,
        num_layers=3,
        num_head=8,
        dim_ffn=2048,
        dropout=0.1,
        dtype=jnp.bfloat16,
        scan_unroll=0,  # production default (models/__init__.py)
    )
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 416, 416, 3), jnp.float32),
        jnp.ones((1, 17), jnp.int32),
        train=False,
    )
    if fold_bn:
        # production eval path: BN folded into conv weights (exact rewrite)
        model = dataclasses.replace(model, fold_bn=True, scan_unroll=0,
                                    pos_grid=416 // 32)
        variables = fold_batchnorm(
            jax.tree_util.tree_map(np.asarray, variables), input_resolution=416
        )
    if fold_bn and os.environ.get("CRIS_INT8_STATIC") == "1":
        # calibrated static-scale int8 serving path (tools/ab_int8.py):
        # attach the "quant" collection from a short synthetic calibration.
        # min_ch=64 covers the 104^2 64-ch layer1 convs -- measured 952.8
        # vs 919.8 img/s at 128 (static only; dynamic regresses at 64)
        os.environ.setdefault("CRIS_INT8_MIN_CH", "64")
        from cris_tpu.checkpoint import calibrate_act_scales

        cal = []
        for i in range(2):
            k = jax.random.PRNGKey(100 + i)
            ki, kw = jax.random.split(k)
            cal.append((
                jax.random.normal(ki, (8, 416, 416, 3), jnp.float32),
                jax.random.randint(kw, (8, 17), 1, 49000, jnp.int32),
            ))
        scales = calibrate_act_scales(
            dataclasses.replace(model, quant_int8=True), variables, cal
        )
        variables = {**variables, "quant": scales}
    variables = jax.device_put(variables)
    return model, variables


def make_eval_bench(preset_name):
    """Returns timed(n, seed) for the folded eval scan."""
    import jax
    import jax.numpy as jnp

    from cris_tpu.ops.resize import resize2d

    model, variables = build_model(preset_name, fold_bn=True)

    @partial(jax.jit, static_argnames=("n",))
    def make_batches(seed, n):
        def gen(i):
            k = jax.random.PRNGKey(seed + i)
            ki, kw = jax.random.split(k)
            return (
                jax.random.normal(ki, (BATCH, 416, 416, 3), jnp.float32),
                jax.random.randint(kw, (BATCH, 17), 1, 49000, jnp.int32),
            )
        return jax.vmap(gen)(jnp.arange(n))

    @jax.jit
    def scan_eval(variables, imgs, words):
        def body(acc, batch):
            img, word = batch
            pred = model.apply(variables, img, word, train=False)
            probs = jax.nn.sigmoid(pred[..., 0].astype(jnp.float32))
            probs = resize2d(probs[..., None], (416, 416), "bicubic", True)
            return acc + probs.sum(), None
        acc, _ = jax.lax.scan(body, 0.0, (imgs, words))
        return acc

    def timed(n, seed):
        imgs, words = make_batches(seed, n)
        jax.block_until_ready((imgs, words))
        t0 = time.perf_counter()
        float(scan_eval(variables, imgs, words))
        return time.perf_counter() - t0

    return timed


def make_train_bench(preset_name):
    """Returns timed(n, seed) for the full train-step scan (fwd+bwd+Adam)."""
    import jax
    import jax.numpy as jnp

    from cris_tpu.engine.trainer import create_train_state, make_optimizer, train_step
    from cris_tpu.utils.config import CfgNode

    model, variables = build_model(preset_name, fold_bn=False)
    cfg = CfgNode({"base_lr": 1e-4, "lr_multi": 0.1, "milestones": [35],
                   "lr_decay": 0.1, "weight_decay": 0.0, "max_norm": 0.0})
    state = create_train_state(model, variables, make_optimizer(cfg, 1000))
    state = jax.device_put(state)

    @partial(jax.jit, static_argnames=("n",))
    def make_batches(seed, n):
        def gen(i):
            k = jax.random.PRNGKey(seed + i)
            ki, kw, km = jax.random.split(k, 3)
            return (
                jax.random.normal(ki, (BATCH, 416, 416, 3), jnp.float32),
                jax.random.randint(kw, (BATCH, 17), 1, 49000, jnp.int32),
                (jax.random.uniform(km, (BATCH, 416, 416, 1)) > 0.5).astype(
                    jnp.float32),
            )
        return jax.vmap(gen)(jnp.arange(n))

    @jax.jit
    def scan_train(state, rng, imgs, words, masks):
        def body(state, batch):
            img, word, mask = batch
            state, metrics = train_step(
                state, {"image": img, "word": word, "mask": mask}, rng)
            return state, metrics["loss"]
        state, losses = jax.lax.scan(body, state, (imgs, words, masks))
        return losses.sum()

    # production rng (rbg by default: threefry dropout bit-gen was ~25 ms
    # of the 180 ms step; see utils/seed.py)
    from cris_tpu.utils import root_key

    rng = root_key(42)

    def timed(n, seed):
        imgs, words, masks = make_batches(seed, n)
        jax.block_until_ready((imgs, words, masks))
        t0 = time.perf_counter()
        float(scan_train(state, rng, imgs, words, masks))
        return time.perf_counter() - t0

    return timed


def measure(timed, budget_s, trials=3):
    """(marginal_ms, amortized_ms, warm_ok): marginal step time, or
    (None, amortized_ms, warm_ok) on deadline. warm_ok=False means no
    post-compile warm run ever succeeded, so the amortized fallback may
    still include compile time."""
    deadline = time.monotonic() + min(time_left(), budget_s)

    def left():
        return deadline - time.monotonic()

    warm_ok = False

    # compile both scan lengths
    t_short_best = timed(N_SHORT, 10_000)
    _dbg(f"compile short: {t_short_best:.2f}s")
    t_long_best = timed(N_LONG, 20_000)
    _dbg(f"compile long: {t_long_best:.2f}s")
    # warm re-run: <1 s when healthy, and it turns the deadline-degraded
    # fallback into a sane amortized rate instead of one contaminated by
    # compile time (a relay stall during warmup can eat the whole budget
    # before this point)
    try:
        t_long_best = min(t_long_best, timed(N_LONG, 25_000))
        warm_ok = True
        _dbg(f"warm long: {t_long_best:.2f}s")
    except Exception:  # noqa: BLE001 -- the fallback must stay available
        pass

    # the relay can stall for seconds; retry until the marginal step time is
    # physically sane (between the bf16 roofline and a stalled bound)
    SANE_MS = (5.0, 5000.0)
    for attempt in range(8):
        if left() < 45:
            _dbg(f"attempt {attempt}: out of budget ({left():.0f}s left)")
            break
        base = 50_000 * (attempt + 1)
        # probe: if even a short scan stalls, let the relay recover before
        # burning trials on garbage timings
        probe = timed(N_SHORT, base - 1)
        warm_ok = True
        _dbg(f"attempt {attempt}: probe {probe:.2f}s")
        if probe > STALL_S:
            if left() > 120:
                time.sleep(min(60, left() - 90))
            continue
        shorts = [timed(N_SHORT, base + i) for i in range(trials)]
        longs = [timed(N_LONG, base + 10_000 + i * 100) for i in range(trials)]
        t_short = min(shorts)
        t_long = min(longs)
        t_short_best = min(t_short_best, t_short)
        t_long_best = min(t_long_best, t_long)
        marginal = (t_long - t_short) / (N_LONG - N_SHORT) * 1000.0
        _dbg(
            f"attempt {attempt}: shorts={[f'{t:.2f}' for t in shorts]} "
            f"longs={[f'{t:.2f}' for t in longs]} marginal={marginal:.1f}ms"
        )
        if SANE_MS[0] <= marginal <= SANE_MS[1]:
            return marginal, None, warm_ok
        if left() > 90:
            time.sleep(20)
    return None, t_long_best / N_LONG * 1000.0, warm_ok


def run_metric(metric, make_bench, budget_s, trials, required):
    try:
        timed = make_bench()
        marginal, amortized, warm_ok = measure(timed, budget_s, trials)
    except Exception as e:  # noqa: BLE001 -- secondary metrics must not kill
        if required:
            raise
        print(json.dumps({"metric": metric, "error": repr(e)[:200]}), flush=True)
        return
    if marginal is not None:
        emit(metric, marginal)
    elif required or amortized is not None:
        note = "deadline-degraded: amortized rate incl. dispatch overhead"
        if not warm_ok:
            note += "; no warm run succeeded, may include compile time"
        emit(metric, amortized, note=note)


def _last_recorded_eval_rate(default=882.1):
    """Latest recorded eval headline from the driver's BENCH_r*.json files
    (the host metric runs BEFORE the TPU metrics so relay stalls cannot
    block it, hence it cannot use this run's own eval number; ADVICE r4:
    derive from the record instead of a hand-bumped constant)."""
    import glob
    import re

    best = None
    for path in sorted(glob.glob(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_r*.json"))):
        try:
            with open(path) as f:
                m = re.search(
                    r'\\?"metric\\?": \\?"cris_r50_eval_throughput_416px_b32'
                    r'\\?", \\?"value\\?": ([0-9.]+)', f.read())
            if m:
                best = float(m.group(1))  # keep the LAST (highest round)
        except OSError:
            continue
    return best if best else default


def run_host_input_metric():
    """4th metric: host-only (no TPU/relay risk), so it runs first."""
    try:
        from cris_tpu.data.host_bench import measure_host_pipeline

        # the chip rate is the last recorded eval headline (the host metric
        # deliberately runs BEFORE the TPU metrics so relay stalls cannot
        # block it); the note states the assumption (ADVICE r3)
        chip_img_s = _last_recorded_eval_rate()
        r = measure_host_pipeline(n_images=48, repeats=2, python_images=16,
                                  chip_img_s=chip_img_s)
        if "native_img_s" not in r:
            print(json.dumps({"metric": "host_input_pipeline_640x480",
                              "error": "native data plane unavailable"}),
                  flush=True)
            return
        print(json.dumps({
            "metric": "host_input_pipeline_640x480",
            "value": r["native_img_s"],
            "unit": "img/s",
            "vs_baseline": round(r["native_img_s"] / r["python_img_s"], 3),
            "note": (
                f"{r['host_cores']} core(s); per-core {r['native_1thread_img_s']}"
                f" img/s -> {r['cores_to_feed_v5e8']} cores to feed a"
                f" v5e-8 at an assumed {chip_img_s} img/s/chip; prewarped fast"
                f" path {r['prewarped_img_s']} img/s/core"
                f" -> {r['cores_to_feed_v5e8_prewarped']} cores"
            ),
        }), flush=True)
    except Exception as e:  # noqa: BLE001 -- must not block TPU metrics
        print(json.dumps({"metric": "host_input_pipeline_640x480",
                          "error": repr(e)[:200]}), flush=True)


def warmup_device():
    """Absorb the relay's first-contact stall (can be minutes after a
    killed job) on a trivial program before any metric budget starts."""
    import jax
    import jax.numpy as jnp

    t0 = time.monotonic()
    f = jax.jit(lambda x: (x @ x).sum())
    for i in range(3):
        x = jax.random.normal(jax.random.PRNGKey(i), (1024, 1024), jnp.bfloat16)
        float(f(x))
    _dbg(f"device warmup: {time.monotonic() - t0:.1f}s")


def main():
    # persistent compile cache: remote-compiled executables serialize back
    # (validated round 4, tools/cache_check.py) -- without this every bench
    # process re-pays ~5-20 s per program and the tail metrics go
    # deadline-degraded (observed in the round-5 pre-flight runs)
    from cris_tpu.cli import setup_compilation_cache

    setup_compilation_cache()
    run_host_input_metric()
    warmup_device()
    # Headline first and with the biggest budget: it must always print.
    run_metric(
        "cris_r50_eval_throughput_416px_b32",
        lambda: make_eval_bench("RN50"),
        budget_s=max(120.0, time_left() - 480.0), trials=3, required=True,
    )
    # Train step next (long remote compile; the most regression-prone path).
    if time_left() > 180:
        run_metric(
            "cris_r50_train_throughput_416px_b32",
            lambda: make_train_bench("RN50"),
            budget_s=time_left() - 150.0, trials=2, required=False,
        )
    if time_left() > 150:
        run_metric(
            "cris_r101_eval_throughput_416px_b32",
            lambda: make_eval_bench("RN101"),
            budget_s=time_left() - 90.0, trials=2, required=False,
        )
    # int8-static serving mode (opt-in, beyond-reference; round-4 A/B
    # +4.3% over bf16). Env gates must stay set through tracing (they
    # are read at trace time in QuantConv), so pop only after measuring.
    if time_left() > 75:
        os.environ["CRIS_INT8"] = "1"
        os.environ["CRIS_INT8_STATIC"] = "1"
        # build_model setdefaults CRIS_INT8_MIN_CH=64 on this path; restore
        # it too so the leaked value cannot apply to any later model build
        # in the same process (ADVICE r4)
        saved_min_ch = os.environ.get("CRIS_INT8_MIN_CH")
        global BATCH
        try:
            run_metric(
                "cris_r50_eval_int8_throughput_416px_b32",
                lambda: make_eval_bench("RN50"),
                budget_s=max(60.0, time_left() - 120.0), trials=2,
                required=False,
            )
            # the measured serving-optimum batch (metric 6; sweep r5)
            if time_left() > 60:
                BATCH = 16
                run_metric(
                    "cris_r50_eval_int8_throughput_416px_b16",
                    lambda: make_eval_bench("RN50"),
                    budget_s=time_left() - 10.0, trials=2, required=False,
                )
        finally:
            BATCH = 32
            os.environ.pop("CRIS_INT8", None)
            os.environ.pop("CRIS_INT8_STATIC", None)
            if saved_min_ch is None:
                os.environ.pop("CRIS_INT8_MIN_CH", None)
            else:
                os.environ["CRIS_INT8_MIN_CH"] = saved_min_ch


if __name__ == "__main__":
    main()
