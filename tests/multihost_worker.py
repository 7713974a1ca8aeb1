"""Worker process for tests/test_multihost.py.

Runs as one of N real processes over a localhost jax.distributed
rendezvous (the DCN path the reference covers with NCCL init at
/root/reference/train.py:80-83) and executes every multi-host code path
that short-circuits at process_count == 1:

- cli.maybe_init_distributed (env-driven rendezvous)
- utils.seed.init_random_seed (seed broadcast, seed.py:24-31)
- engine.Evaluator._allgather (process_allgather of per-sample IoUs)
- parallel.put_global (per-host batch shards -> global array)
- a full sharded train step + Evaluator.validate over a process-sharded
  loader, whose results the parent compares against a single-process run.

Usage: python multihost_worker.py <process_id> <num_processes> <port> <out.json>
"""

import json
import os
import sys

PID = int(sys.argv[1])
NPROC = int(sys.argv[2])
PORT = sys.argv[3]
OUT = sys.argv[4]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{PORT}"
os.environ["JAX_NUM_PROCESSES"] = str(NPROC)
os.environ["JAX_PROCESS_ID"] = str(PID)

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
for p in (REPO, HERE):
    if p not in sys.path:
        sys.path.insert(0, p)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from cris_tpu import cli  # noqa: E402

cli.maybe_init_distributed()
assert jax.process_count() == NPROC, jax.process_count()
assert jax.local_device_count() == 2
assert jax.device_count() == 2 * NPROC

results = {}

# ---- 1) seed broadcast: different host RNG states, same resulting seed
from cris_tpu.utils.seed import init_random_seed  # noqa: E402

np.random.seed(1000 + 37 * PID)
seed = init_random_seed(None)
from jax.experimental import multihost_utils  # noqa: E402

all_seeds = multihost_utils.process_allgather(np.asarray([seed], np.int32))
assert len(np.unique(np.asarray(all_seeds))) == 1, all_seeds
results["seed"] = int(seed)

# ---- 2) Evaluator._allgather of uneven-ish host-local metric lists
from cris_tpu.engine.evaluator import Evaluator  # noqa: E402

local_ious = [0.1 + 0.2 * PID, 0.3 + 0.2 * PID]
g, inter, union = Evaluator._allgather(local_ious, 5 * (PID + 1), 7 * (PID + 1))
assert len(g) == 2 * NPROC, g
assert abs(inter - sum(5 * (i + 1) for i in range(NPROC))) < 1e-9
assert abs(union - sum(7 * (i + 1) for i in range(NPROC))) < 1e-9
results["allgather_ious"] = sorted(round(float(x), 6) for x in g)

# ---- 3) sharded train step over the 2-host mesh (same numbers as the
# parent's single-process run on the identical global batch)
import jax.numpy as jnp  # noqa: E402

from conftest import tiny_cris, tiny_train_cfg  # noqa: E402
from cris_tpu.engine import create_train_state, make_optimizer, train_step  # noqa: E402
from cris_tpu.parallel import (  # noqa: E402
    batch_sharding,
    make_mesh,
    make_param_shardings,
    put_global,
)

model = tiny_cris(dropout=0.0)
GLOBAL_B = 8
rng_data = np.random.RandomState(0)
g_image = rng_data.randn(GLOBAL_B, 64, 64, 3).astype(np.float32)
g_word = rng_data.randint(1, 49000, (GLOBAL_B, 17)).astype(np.int32)
g_mask = (rng_data.rand(GLOBAL_B, 64, 64, 1) > 0.5).astype(np.float32)

variables = jax.jit(model.init, static_argnames=("train",))(
    jax.random.PRNGKey(0),
    jnp.asarray(g_image[:1]), jnp.asarray(g_word[:1]), jnp.asarray(g_mask[:1]),
    train=False,
)
variables = jax.tree.map(np.asarray, variables)

mesh = make_mesh(-1, 1)  # dp over all 2*NPROC devices
variables = put_global(variables, make_param_shardings(mesh, variables))
per = GLOBAL_B // NPROC
local = {
    "image": g_image[PID * per : (PID + 1) * per],
    "word": g_word[PID * per : (PID + 1) * per],
    "mask": g_mask[PID * per : (PID + 1) * per],
}
device_batch = put_global(local, batch_sharding(mesh))
state = create_train_state(model, variables, make_optimizer(tiny_train_cfg(), 4))
with mesh:
    state, metrics = jax.jit(train_step)(state, device_batch, jax.random.PRNGKey(1))
results["train_loss"] = float(metrics["loss"])
results["train_iou"] = float(metrics["iou"])

# ---- 4) full Evaluator.validate over a process-sharded loader
from cris_tpu.data import RefDataLoader, RefDataset  # noqa: E402

val_data = RefDataset(
    "synthetic://10?seed=3", None, "refcoco", "val", "val", 64, 17
)
loader = RefDataLoader(
    val_data, batch_size=4, shuffle=False, num_workers=1,
    process_index=jax.process_index(), process_count=jax.process_count(),
)
evaluator = Evaluator(model, 64, mesh, batch_size=4)
eval_vars = {
    "params": state.params,
    "batch_stats": state.batch_stats,
}
iou, prec = evaluator.validate(loader, eval_vars, epoch=1, epochs=1)
results["val_iou"] = float(iou)
results["val_prec"] = {k: float(v) for k, v in prec.items()}

# ---- 5) distributed all-sentences inference: records round-robin across
# processes, dummy-batch lockstep at the tail, varlen IoU allgather
test_data = RefDataset(
    "synthetic://5?seed=5", None, "refcoco", "val", "test", 64, 17
)
t_iou, t_prec = evaluator.inference(
    test_data, eval_vars, word_len=17, progress=False
)
results["test_iou"] = float(t_iou)
results["test_oiou"] = float(t_prec["oIoU"])

with open(OUT, "w") as f:
    json.dump(results, f)
print(f"worker {PID} ok", flush=True)
