"""Real two-process multi-host tests.

Launches 2 OS processes over a localhost jax.distributed rendezvous
(CPU backend, 2 virtual devices each -> a 4-device global mesh) and
executes the code paths that short-circuit at process_count == 1:
seed broadcast (utils/seed.py:24-31), Evaluator._allgather
(engine/evaluator.py), put_global batch assembly (parallel/mesh.py), the
sharded train step, and a full Evaluator.validate over a process-sharded
loader. The reference's equivalent is NCCL DDP (train.py:80-83,
utils/misc.py:14-58), which it can only exercise on real GPUs; here the
rendezvous + collectives run for real over the Gloo CPU backend.

The workers' numbers are then compared against a single-process run of
the identical computation (GSPMD semantics: sharding must not change
results).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def worker_results(tmp_path_factory):
    """Run the 2-process job once; individual tests assert on its output."""
    out_dir = tmp_path_factory.mktemp("multihost")
    port = _free_port()
    nproc = 2
    procs = []
    outs = []
    env = {
        k: v
        for k, v in os.environ.items()
        # the workers provision their own platform/device/rendezvous env
        if not k.startswith(("JAX_", "XLA_"))
    }
    for pid in range(nproc):
        out = os.path.join(str(out_dir), f"r{pid}.json")
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, str(pid), str(nproc), str(port), out],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
        )
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    return [json.load(open(o)) for o in outs]


def test_two_process_rendezvous_and_seed_broadcast(worker_results):
    r0, r1 = worker_results
    # both processes ended up with the same (process-0) seed despite
    # different host RNG states
    assert r0["seed"] == r1["seed"]


def test_two_process_allgather(worker_results):
    r0, r1 = worker_results
    expected = sorted(
        round(x, 6) for x in (0.1, 0.3, 0.1 + 0.2, 0.3 + 0.2)
    )
    assert r0["allgather_ious"] == expected
    assert r1["allgather_ious"] == expected


def test_two_process_train_step_matches_single_process(worker_results):
    """dp over 2 hosts x 2 devices == one-process numerics."""
    r0, r1 = worker_results
    assert r0["train_loss"] == pytest.approx(r1["train_loss"], abs=1e-6)

    # identical computation in THIS (single) process on the global batch
    import jax
    import jax.numpy as jnp

    from conftest import tiny_cris, tiny_train_cfg
    from cris_tpu.engine import create_train_state, make_optimizer, train_step
    from cris_tpu.parallel import (
        batch_sharding, make_mesh, make_param_shardings, put_global,
    )

    model = tiny_cris(dropout=0.0)
    rng_data = np.random.RandomState(0)
    g_image = rng_data.randn(8, 64, 64, 3).astype(np.float32)
    g_word = rng_data.randint(1, 49000, (8, 17)).astype(np.int32)
    g_mask = (rng_data.rand(8, 64, 64, 1) > 0.5).astype(np.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0),
        jnp.asarray(g_image[:1]), jnp.asarray(g_word[:1]),
        jnp.asarray(g_mask[:1]), train=False,
    )
    mesh = make_mesh(-1, 1)
    variables = put_global(
        jax.tree.map(np.asarray, variables),
        make_param_shardings(mesh, variables),
    )
    batch = put_global(
        {"image": g_image, "word": g_word, "mask": g_mask},
        batch_sharding(mesh),
    )
    state = create_train_state(model, variables, make_optimizer(tiny_train_cfg(), 4))
    with mesh:
        _, metrics = jax.jit(train_step)(state, batch, jax.random.PRNGKey(1))
    assert r0["train_loss"] == pytest.approx(float(metrics["loss"]), abs=5e-4)
    assert r0["train_iou"] == pytest.approx(float(metrics["iou"]), abs=5e-2)


def test_two_process_validate_matches_single_process(worker_results):
    """Distributed validate (sharded loader + process_allgather of IoUs)
    reproduces the single-process result exactly: same per-sample set."""
    r0, r1 = worker_results
    assert r0["val_iou"] == pytest.approx(r1["val_iou"], abs=1e-9)
    assert r0["val_prec"] == r1["val_prec"]

    import jax
    import jax.numpy as jnp

    from conftest import tiny_cris, tiny_train_cfg
    from cris_tpu.data import RefDataLoader, RefDataset
    from cris_tpu.engine import create_train_state, make_optimizer, train_step
    from cris_tpu.engine.evaluator import Evaluator
    from cris_tpu.parallel import (
        batch_sharding, make_mesh, make_param_shardings, put_global,
    )

    model = tiny_cris(dropout=0.0)
    rng_data = np.random.RandomState(0)
    g_image = rng_data.randn(8, 64, 64, 3).astype(np.float32)
    g_word = rng_data.randint(1, 49000, (8, 17)).astype(np.int32)
    g_mask = (rng_data.rand(8, 64, 64, 1) > 0.5).astype(np.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0),
        jnp.asarray(g_image[:1]), jnp.asarray(g_word[:1]),
        jnp.asarray(g_mask[:1]), train=False,
    )
    mesh = make_mesh(-1, 1)
    variables = put_global(
        jax.tree.map(np.asarray, variables),
        make_param_shardings(mesh, variables),
    )
    batch = put_global(
        {"image": g_image, "word": g_word, "mask": g_mask},
        batch_sharding(mesh),
    )
    state = create_train_state(model, variables, make_optimizer(tiny_train_cfg(), 4))
    with mesh:
        state, _ = jax.jit(train_step)(state, batch, jax.random.PRNGKey(1))

    val_data = RefDataset("synthetic://10?seed=3", None, "refcoco", "val",
                          "val", 64, 17)
    # NB: workers ran with per-host batch 4 over 2 hosts = global 8
    loader = RefDataLoader(val_data, batch_size=8, shuffle=False, num_workers=1)
    evaluator = Evaluator(model, 64, mesh, batch_size=8)
    eval_vars = {"params": state.params, "batch_stats": state.batch_stats}
    iou, prec = evaluator.validate(loader, eval_vars, epoch=1, epochs=1)
    assert r0["val_iou"] == pytest.approx(float(iou), abs=2e-3)

    # distributed test-mode inference (5 records round-robin over 2 hosts,
    # every sentence) == this single process over the same records
    r0t, r1t = worker_results
    assert r0t["test_iou"] == pytest.approx(r1t["test_iou"], abs=1e-9)
    test_data = RefDataset("synthetic://5?seed=5", None, "refcoco", "val",
                           "test", 64, 17)
    t_iou, t_prec = evaluator.inference(
        test_data, eval_vars, word_len=17, progress=False
    )
    assert r0t["test_iou"] == pytest.approx(float(t_iou), abs=2e-3)
    assert r0t["test_oiou"] == pytest.approx(float(t_prec["oIoU"]), abs=2e-3)
