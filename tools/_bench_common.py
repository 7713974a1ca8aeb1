"""Shared scaffolding for the TPU measurement tools (VERDICT r3 task 6).

Every microbench/A/B tool in tools/ needs the same three pieces, each of
which has bitten us when hand-copied (CLAUDE.md round-3 code-review):

1. ``probe()`` -- absorb the relay tunnel's first-contact stall (can be
   5-23 minutes after a killed job) on trivial dispatches BEFORE any
   timed work, with a DISTINCT buffer per dispatch (the terminal
   value-caches identical dispatches).
2. ``marginal()`` -- the bench.py methodology: one jitted lax.scan over n
   device-resident iterations, timed at n=2 and n=12; the difference
   cancels the ~30 ms fixed relay round trip. Repeats use distinct seeds
   (value-cache-safe; a ``*= (1+eps)`` perturbation is NOT enough -- sub-ulp
   bf16 changes round away).
3. ``env_ab()`` -- the env-toggle A/B loop (rebuild the jitted program
   under each setting of a CRIS_* gate, measure marginal each).

Usage from a tool::

    from tools._bench_common import probe, marginal, env_ab
    probe()
    ms = marginal(timed, "full")                   # timed(n, seed) -> s
    results = env_ab("CRIS_FUSE_UPSAMPLE", ("0", "1"),
                     lambda: bench.make_eval_bench("RN50"),
                     batch=32, label="eval")
"""

import os
import time

N_SHORT = 2
N_LONG = 12


def probe(n=3, size=256, label="probe"):
    """Absorb the relay's first-contact stall on trivial dispatches.

    Each dispatch uses a distinct buffer (relay value-cache) and prints
    its wall time so a stalled tunnel is visible in the log.
    """
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(0)
    for i in range(n):
        t0 = time.monotonic()
        x = jnp.asarray(rng.randn(size, size).astype(np.float32))
        float((x @ x).sum())
        print(f"{label} {i}: {time.monotonic() - t0:.1f}s", flush=True)


def marginal(timed, label, batch=None, trials=3, seed_base=1000,
             n_short=N_SHORT, n_long=N_LONG):
    """Marginal per-iteration time of ``timed(n, seed) -> seconds``.

    First call per scan length is compile+dispatch (printed, not timed);
    then best-of-``trials`` with distinct seeds per rep. Returns ms/iter;
    if ``batch`` is given, also prints the img/s rate and returns
    ``(ms, rate)``.
    """
    ts = {}
    for n in (n_short, n_long):
        t0 = time.monotonic()
        timed(n, seed_base // 10 + n)
        print(f"  [{label}] n={n}: compile+1st {time.monotonic() - t0:.1f}s",
              flush=True)
        best = 1e9
        for rep in range(trials):
            best = min(best, timed(n, seed_base + 31 * rep + n))
        ts[n] = best
        print(f"  [{label}] n={n}: best {best * 1e3:.1f}ms", flush=True)
    span = n_long - n_short
    ms = (ts[n_long] - ts[n_short]) / span * 1e3
    if batch is not None:
        rate = batch * span / (ts[n_long] - ts[n_short])
        print(f"  [{label}] marginal {ms:.2f} ms/iter = {rate:.1f} img/s",
              flush=True)
        return ms, rate
    print(f"  [{label}] marginal {ms:.2f} ms/iter", flush=True)
    return ms


def env_ab(env_var, settings, make_timed, batch=None, label="", trials=3):
    """A/B a CRIS_* env gate: for each setting, rebuild the timed program
    and measure its marginal rate. ``settings`` entries may be a plain
    value for ``env_var`` or a dict of {var: value} for multi-var
    configurations. Restores the environment afterwards.

    Returns {setting_repr: marginal result}.
    """
    saved = {}

    def set_env(d):
        for k, v in d.items():
            if k not in saved:
                saved[k] = os.environ.get(k)
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = str(v)

    results = {}
    try:
        for setting in settings:
            d = dict(setting) if isinstance(setting, dict) else {env_var: setting}
            set_env(d)
            key = ",".join(f"{k.split('_')[-1]}={v}" for k, v in d.items()) \
                if isinstance(setting, dict) else str(setting)
            tag = f"{label} {env_var}={key}" if label else f"{env_var}={key}"
            timed = make_timed()
            results[key] = marginal(timed, tag, batch=batch, trials=trials,
                                    seed_base=1000 + 97 * len(results))
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return results
