"""Worker for the 2-process data-parallel test (SURVEY.md §2.7/§5.8).

Each process owns 4 virtual CPU devices; ``jax.distributed.initialize``
forms the 8-device global mesh (the DCN-crossing DDP stand-in). The worker
runs the real multi-host ingredients: ``host_shard`` loader sharding,
``barrier()``, global batch assembly from process-local data, and one
sharded train step — then process 0 reports loss + a parameter fingerprint
for the parent test to compare against a single-process run.

Usage: python multiproc_worker.py <coordinator> <num_procs> <pid> <outdir>
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)


def main():
    coordinator, num_procs, pid, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=num_procs, process_id=pid
    )
    assert jax.process_count() == num_procs, jax.process_count()
    assert len(jax.devices()) == 4 * num_procs
    assert len(jax.local_devices()) == 4

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from megreader_tpu.core import Charset
    from megreader_tpu.data import Loader, SyntheticRecognitionDataset, recognition_collate
    from megreader_tpu.models import CTCRecognizer
    from megreader_tpu.ops.image import normalize, resize_with_aspect_pad
    from megreader_tpu.parallel import barrier, is_primary, make_mesh
    from megreader_tpu.train import OptimizerConfig, create_train_state, make_train_step

    assert is_primary() == (pid == 0)

    cs = Charset()
    ds = SyntheticRecognitionDataset(n=8)
    loader = Loader(
        ds, batch_size=4,
        collate=lambda s: recognition_collate(s, cs),
        shuffle=False, prefetch=0, host_shard=True,
    )
    # host_shard: each process sees a disjoint interleaved half.
    my_indices = [int(i) for i in loader._indices()]
    with open(os.path.join(outdir, f"indices_{pid}.json"), "w") as f:
        json.dump(my_indices, f)
    assert len(loader) == 1

    raw = next(iter(loader))
    img, _ = resize_with_aspect_pad(
        jnp.asarray(raw["image"], jnp.float32), jnp.asarray(raw["size"]), (32, 100)
    )
    local = {
        "image": np.asarray(normalize(img)),
        "label": np.asarray(raw["label"]),
        "label_length": np.asarray(raw["label_length"]),
    }

    barrier("before-step")  # the torch.distributed.barrier() analog

    mesh = make_mesh()  # 8 global devices: ('data', 'model') = (8, 1)
    assert mesh.shape["data"] == 4 * num_procs
    data_sh = NamedSharding(mesh, P("data"))
    global_batch = {
        k: jax.make_array_from_process_local_data(data_sh, v)
        for k, v in local.items()
    }
    assert global_batch["image"].shape[0] == 8  # global batch spans both hosts

    model = CTCRecognizer(
        num_classes=cs.num_classes, hidden=16, num_encoder_layers=1, loss_impl="xla"
    )
    tx = OptimizerConfig(
        name="sgd", lr=0.01, momentum=0.0, weight_decay=0.0, schedule="constant"
    ).make()
    state = create_train_state(model, jax.random.PRNGKey(0), local, tx)
    step_fn = make_train_step(model, tx, mesh=mesh, donate=False)
    new_state, metrics = step_fn(state, global_batch)
    loss = float(np.asarray(metrics["loss"].addressable_data(0)))

    barrier("after-step")

    if is_primary():
        leaves = jax.tree_util.tree_leaves(new_state.params)
        np.savez(
            os.path.join(outdir, "params.npz"),
            **{str(i): np.asarray(l.addressable_data(0)) for i, l in enumerate(leaves)},
        )
        with open(os.path.join(outdir, "result.json"), "w") as f:
            json.dump({"loss": loss, "step": 1}, f)
    print(f"worker {pid}: ok loss={loss:.5f}")


if __name__ == "__main__":
    main()
