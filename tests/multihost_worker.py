"""Worker process for tests/test_multihost.py (NOT a test module).

Joins a 2-process JAX distributed runtime on CPU (2 local devices each →
a 4-device global mesh), runs two real mnist train steps with the batch
assembled from process-local shards (the multi-host path of
parallel/mesh.py:shard_batch), and writes the resulting metrics as JSON.

argv: <process_id> <num_processes> <coordinator_port> <out_json>
"""

import dataclasses
import json
import os as _os
import sys

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    pid, nprocs, port, out_json = (int(sys.argv[1]), int(sys.argv[2]),
                                   sys.argv[3], sys.argv[4])
    import os
    os.environ["MOG_COORDINATOR"] = f"localhost:{port}"
    os.environ["MOG_NUM_PROCESSES"] = str(nprocs)
    os.environ["MOG_PROCESS_ID"] = str(pid)

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    from multiple_objects_gan_tpu.parallel.multihost import (
        is_main_process, local_batch_size, maybe_initialize_distributed)
    assert maybe_initialize_distributed()
    assert jax.process_count() == nprocs
    assert jax.device_count() == 2 * nprocs

    import jax.numpy as jnp
    import numpy as np

    from multiple_objects_gan_tpu.data.datasets import Loader
    from multiple_objects_gan_tpu.data.synthetic import synthetic_batch
    from multiple_objects_gan_tpu.models import common
    from multiple_objects_gan_tpu.models.stage1 import Stage1D, Stage1G
    from multiple_objects_gan_tpu.parallel import mesh as pmesh
    from multiple_objects_gan_tpu.train.step import (
        create_state, make_train_step)

    cfg = dataclasses.replace(common.MNIST, gf_dim=8, df_dim=8)
    g, d = Stage1G(cfg), Stage1D(cfg)
    rng = jax.random.PRNGKey(0)
    state = create_state(cfg, g, d, rng, batch_size=2)

    global_batch = 8
    # every process generates the identical global batch deterministically,
    # then contributes only its local slice — the contract of shard_batch
    full = synthetic_batch(cfg, global_batch, seed=5)
    lb = local_batch_size(global_batch)
    local = {k: np.asarray(v)[pid * lb:(pid + 1) * lb] for k, v in
             full.items()}

    mesh = pmesh.make_mesh_for_batch(lb)
    assert len(mesh.devices.ravel()) == 2 * nprocs
    state = pmesh.replicate_state(mesh, state)
    step = pmesh.jit_train_step(make_train_step(cfg, g, d))

    lr = np.float32(2e-4)
    for _ in range(2):
        sharded = pmesh.shard_batch(mesh, local)
        state, metrics = step(state, sharded, rng, lr, lr)
    host = {k: float(v) for k, v in metrics.items()}

    # exercise the Loader's multi-host data sharding contract too
    class _Rows:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return {"idx": np.asarray(i, np.int64)}

    ld = Loader(_Rows(10), 2, shuffle=True, seed=3, shard=(pid, nprocs))
    seen = [b["idx"].tolist() for b in ld.epoch(0)]
    host["_loader_rows"] = seen
    host["_is_main"] = is_main_process()

    with open(out_json, "w") as f:
        json.dump(host, f)
    print(f"proc {pid} OK", flush=True)


if __name__ == "__main__":
    main()
