"""Worker for the 2-process jax.distributed test (test_multiprocess_dist.py).

Each process owns 4 virtual CPU devices; together they form one 8-device
(data=8) mesh. The worker runs one data-parallel latent-NeRF train step with
process-local view sampling (core/views host-folded PRNG — SURVEY.md §5.8
"host-local data loading") and prints the resulting loss + grad checksum;
the parent asserts both processes agree (params replicated ⇒ identical psum
results everywhere).

Usage: python tests/_mp_worker.py <coordinator> <num_procs> <proc_id>
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main(coordinator: str, num_procs: int, proc_id: int) -> None:
    from tpunerf.dist.mesh import initialize_multihost, make_mesh

    initialize_multihost(coordinator, num_procs, proc_id)
    assert jax.process_count() == num_procs, jax.process_count()
    assert len(jax.devices()) == num_procs * 4, len(jax.devices())
    assert len(jax.local_devices()) == 4

    import pathlib
    import tempfile

    from tpunerf.core.views import ViewSamplerConfig, rand_poses
    from tpunerf.training.config import (GuideConfig, LogConfig, OptimConfig,
                                         RenderConfig, TrainConfig)
    from tpunerf.training.latent_nerf_app import LatentNeRFApp

    cfg = TrainConfig(
        log=LogConfig(exp_name=f"mp{proc_id}",
                      exp_root=pathlib.Path(tempfile.mkdtemp())),
        render=RenderConfig(train_grid_size=12, num_samples_per_ray=16,
                            batch_size=8),
        optim=OptimConfig(iters=1, seed=0),
        guide=GuideConfig(text="a sand castle", tiny_diffusion=True),
    )
    app = LatentNeRFApp.create(cfg)
    params = app.init_params(jax.random.key(0))   # same key ⇒ replicated

    layout = make_mesh()                          # all 8 global devs on data
    params = jax.device_put(params, layout.replicated())

    # host-local view sampling: each process materializes only its shard,
    # from a host-folded key (the "no data plumbing" design of §2.7)
    local = rand_poses(jax.random.fold_in(jax.random.key(1), proc_id),
                       4, ViewSamplerConfig())
    views = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            layout.views(), np.asarray(x),
            (num_procs * 4,) + x.shape[1:]),
        local)

    @jax.jit
    def step(params, views, key):
        def loss_fn(p):
            loss, _ = app.loss_fn(p, views, key, jnp.asarray(0))
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        gsum = sum(jnp.sum(jnp.abs(g))
                   for g in jax.tree_util.tree_leaves(grads))
        return loss, gsum

    loss, gsum = step(params, views, jax.random.key(2))
    # fully-replicated outputs: fetchable identically on every process
    print(f"MPRESULT {float(loss):.6e} {float(gsum):.6e}", flush=True)

    # explicit barrier BEFORE process exit: on a saturated 2-core host one
    # worker can finish >30 s before the other, and the coordination
    # service's atexit shutdown barrier (30 s deadline) then fails the
    # whole test (observed at suite-wide -n 2). This collective blocks the
    # early worker until both arrive, so shutdown is reached together.
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("mp_worker_done")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
