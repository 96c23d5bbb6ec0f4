"""Worker for the two-process jax.distributed smoke test.

Launched by tests/test_multihost.py as `python multihost_worker.py
<proc_id> <nproc> <port>`. Each process exposes 4 virtual CPU devices,
rendezvouses over localhost (the jax.distributed path that
streamvln_tpu/train.py:134-135 uses on real pods, matching the
reference's torchrun env:// init in streamvln/utils/dist.py:48-89),
builds the global dp2/fsdp4 mesh, and runs two FSDP train steps on the
tiny model. Prints `LOSS <step0> <step1>` for the parent to compare
across processes.
"""
import os
import sys


def main():
    proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=proc_id)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc, jax.devices()
    assert len(jax.local_devices()) == 4

    import numpy as np
    import jax.numpy as jnp
    from streamvln_tpu.configs import tiny_streamvln
    from streamvln_tpu.models import streamvln
    from streamvln_tpu.parallel import mesh as mesh_lib
    from streamvln_tpu.parallel import train as train_lib
    from streamvln_tpu.utils.constants import IGNORE_INDEX, \
        IMAGE_TOKEN_INDEX

    cfg = tiny_streamvln()
    tcfg = train_lib.TrainConfig(learning_rate=1e-3, total_steps=10,
                                 warmup_ratio=0.0, remat=False)
    mesh = mesh_lib.make_mesh(dp=2, fsdp=4, tp=1)

    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    params = mesh_lib.shard_params(params, mesh)
    state = train_lib.create_train_state(params, tcfg)
    step = train_lib.make_train_step(cfg, tcfg, mesh)

    rng = np.random.RandomState(0)
    B, T = 8, 32
    layouts = []
    for _ in range(B):
        ids = np.array([7, IMAGE_TOKEN_INDEX, 5, 6, 8, 9], np.int32)
        labels = np.array([IGNORE_INDEX, IGNORE_INDEX, 5, 6, 8, 9],
                          np.int32)
        layouts.append(streamvln.build_splice_layout(
            ids, cfg, labels=labels, pad_to=T))
    batch = {k: jnp.asarray(v) for k, v in
             streamvln.stack_layouts(layouts).items()}
    batch.pop("lengths")
    S = cfg.vision.image_size
    batch["images"] = jnp.asarray(rng.rand(B, 1, S, S, 3)
                                  .astype(np.float32))
    sharding = jax.sharding.NamedSharding(mesh, mesh_lib.batch_spec())

    def put(x):
        spec = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(*(("dp", "fsdp"),)))
        return jax.make_array_from_process_local_data(
            spec, np.asarray(x)[proc_id * (B // nproc):
                                (proc_id + 1) * (B // nproc)])
    # every process holds the full batch; hand each its local rows
    batch = {k: put(v) for k, v in batch.items()}

    losses = []
    # lr(0) is 0 under the warmup-cosine schedule, so the first visible
    # loss movement is at step 2 (reported loss is pre-update)
    for _ in range(3):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses)), losses
    print(f"LOSS {losses[0]:.9g} {losses[-1]:.9g}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
