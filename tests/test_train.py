"""Training loop + data-parallel mesh tests (8 virtual CPU devices)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megreader_tpu.core import Charset
from megreader_tpu.data import Loader, SyntheticRecognitionDataset, recognition_collate
from megreader_tpu.models import CTCRecognizer
from megreader_tpu.ops.image import normalize, resize_with_aspect_pad
from megreader_tpu.parallel import make_mesh, shard_batch
from megreader_tpu.train import (
    OptimizerConfig,
    create_train_state,
    make_train_step,
)


def _prep(batch, charset_unused=None):
    """Host batch -> model batch: device resize to 32x100 + normalize."""
    img, _w = resize_with_aspect_pad(
        jnp.asarray(batch["image"], jnp.float32), jnp.asarray(batch["size"]), (32, 100)
    )
    return {
        "image": normalize(img),
        "label": jnp.asarray(batch["label"]),
        "label_length": jnp.asarray(batch["label_length"]),
    }


@pytest.fixture(scope="module")
def tiny_setup():
    cs = Charset()
    ds = SyntheticRecognitionDataset(n=16)
    loader = Loader(
        ds, batch_size=8, collate=lambda s: recognition_collate(s, cs), shuffle=True, prefetch=0
    )
    model = CTCRecognizer(num_classes=cs.num_classes, hidden=32, num_encoder_layers=1)
    return cs, loader, model


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}


def test_single_device_train_steps_reduce_loss(tiny_setup):
    cs, loader, model = tiny_setup
    tx = OptimizerConfig(name="adam", lr=3e-4, schedule="constant").make()
    batch = _prep(next(iter(loader)))
    state = create_train_state(model, jax.random.PRNGKey(0), batch, tx)
    step_fn = make_train_step(model, tx, mesh=None, donate=False)

    losses = []
    for _ in range(8):
        state, metrics = step_fn(state, batch)  # same batch: loss must drop
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses[-1])


def test_data_parallel_step_matches_single_device(tiny_setup):
    """DP over the 8-device mesh must produce the same update as 1 device."""
    cs, loader, model = tiny_setup
    tx = OptimizerConfig(name="sgd", lr=0.01, momentum=0.0, weight_decay=0.0, schedule="constant").make()
    # Fixed batch (not loader order, which depends on test execution order).
    from megreader_tpu.data import recognition_collate

    samples = [loader.dataset[i] for i in range(8)]
    batch = _prep(recognition_collate(samples, cs))

    state0 = create_train_state(model, jax.random.PRNGKey(0), batch, tx)
    single = make_train_step(model, tx, mesh=None, donate=False)
    s1, m1 = single(state0, batch)

    mesh = make_mesh()
    sharded_batch = shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh)
    dp = make_train_step(model, tx, mesh=mesh, donate=False)
    s2, m2 = dp(state0, sharded_batch)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(l1, l2):
        # all-reduce order across 8 shards vs single fused reduction: fp32
        # round-off only
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=3e-4)


def test_checkpoint_roundtrip(tmp_path, tiny_setup):
    from megreader_tpu.train import CheckpointManager

    cs, loader, model = tiny_setup
    tx = OptimizerConfig(schedule="constant").make()
    batch = _prep(next(iter(loader)))
    state = create_train_state(model, jax.random.PRNGKey(0), batch, tx)
    state = state.replace(step=jnp.asarray(7, jnp.int32))

    mgr = CheckpointManager(str(tmp_path), save_every_steps=1, use_orbax=False)
    assert mgr.save(state, force=True)
    fresh = create_train_state(model, jax.random.PRNGKey(1), batch, tx)
    restored = mgr.restore(fresh)
    assert int(restored.step) == 7
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_fused_prepare_step_matches_host_prepare(tiny_setup):
    """Tracing prepare INTO the jitted step (Trainer fuse_prepare) must give
    the same update as host-side prepare + plain step."""
    cs, loader, model = tiny_setup
    tx = OptimizerConfig(
        name="sgd", lr=0.01, momentum=0.0, weight_decay=0.0, schedule="constant"
    ).make()
    raw = next(iter(loader))
    prepared = _prep(raw)

    state0 = create_train_state(model, jax.random.PRNGKey(0), prepared, tx)
    plain = make_train_step(model, tx, mesh=None, donate=False)
    s1, m1 = plain(state0, prepared)

    fused = make_train_step(
        model, tx, mesh=None, donate=False, prepare=lambda b: _prep(b)
    )
    raw_arrays = {
        k: np.asarray(v) for k, v in raw.items() if isinstance(v, np.ndarray)
    }
    s2, m2 = fused(state0, raw_arrays)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        # fusing ingest into the step changes XLA's fusion choices: fp32
        # round-off level differences only
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=3e-4)


def test_restore_variables_ignores_optimizer_drift(tmp_path, tiny_setup):
    """Params-only restore must load checkpoints trained under a DIFFERENT
    optimizer config (opt_state trees differ -> full-state restore refuses)."""
    from megreader_tpu.train import CheckpointManager

    cs, loader, model = tiny_setup
    batch = _prep(next(iter(loader)))
    tx_train = OptimizerConfig(name="adamw", lr=3e-4, schedule="constant").make()
    state = create_train_state(model, jax.random.PRNGKey(0), batch, tx_train)

    mgr = CheckpointManager(str(tmp_path), save_every_steps=1, use_orbax=False)
    assert mgr.save(state, force=True)

    fresh = model.init(jax.random.PRNGKey(1), batch["image"])
    restored = mgr.restore_variables(fresh)
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored["params"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_loader_shapes(tiny_setup):
    cs, loader, model = tiny_setup
    b = next(iter(loader))
    assert b["image"].shape == (8, 64, 256, 3)
    assert b["label"].shape == (8, 32)
    assert len(b["text"]) == 8


def test_gradient_accumulation(tiny_setup):
    """optax.MultiSteps: params frozen until `accumulate_steps` micro-steps.

    (Exact full-batch equivalence does not hold with BatchNorm in train
    mode — per-micro-batch statistics differ — so the test checks the
    accumulation semantics, not numeric identity.)
    """
    cs, loader, model = tiny_setup
    from megreader_tpu.train import OptimizerConfig, create_train_state, make_train_step

    batch = _prep(next(iter(loader)))
    half1 = {k: v[:4] for k, v in batch.items()}
    half2 = {k: v[4:] for k, v in batch.items()}

    tx_acc = OptimizerConfig(name="sgd", lr=0.01, momentum=0.0, weight_decay=0.0,
                             schedule="constant", accumulate_steps=2).make()
    s0 = create_train_state(model, jax.random.PRNGKey(0), batch, tx_acc)
    acc_step = make_train_step(model, tx_acc, donate=False)

    s1, _ = acc_step(s0, half1)
    a0 = jax.tree_util.tree_leaves(s0.params)
    a1 = jax.tree_util.tree_leaves(s1.params)
    for x, y in zip(a0, a1):  # first micro-step: accumulate only, no update
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    s2, _ = acc_step(s1, half2)
    a2 = jax.tree_util.tree_leaves(s2.params)
    changed = sum(
        float(np.abs(np.asarray(x) - np.asarray(y)).max()) > 0
        for x, y in zip(a1, a2)
    )
    assert changed > len(a2) * 0.5  # second micro-step applies the update


def test_trainer_debug_nans_flag(tmp_path, tiny_setup):
    """debug_nans=True turns on jax_debug_nans before the first step
    (SURVEY.md §5.2's optional NaN-check mode)."""
    cs, loader, model = tiny_setup
    from megreader_tpu.train import Trainer

    tr = Trainer(
        model=model,
        loader=loader,
        optimizer=OptimizerConfig(name="sgd", lr=0.01, schedule="constant"),
        workspace=str(tmp_path),
        epochs=1,
        use_mesh=False,
        prepare_batch=_prep,
        debug_nans=True,
    )
    try:
        tr.train(resume=False)
        assert jax.config.jax_debug_nans
    finally:
        jax.config.update("jax_debug_nans", False)


def test_trainer_threads_step_into_prepare(tmp_path, tiny_setup):
    """Step-aware prepare fns receive the current trainer step.

    Uses ``fuse_prepare=False`` (host-side prepare): with fusion the step is
    threaded as the TRACED ``state.step`` inside jit, which a side-effecting
    probe like this cannot record. The fused path is covered by
    test_fused_prepare_step_matches_host_prepare and the trainer-resume
    integration test (fusion is the default)."""
    cs, loader, model = tiny_setup
    from megreader_tpu.train import Trainer

    seen = []

    def prep(batch, step=0):
        seen.append(step)
        return _prep(batch)

    tr = Trainer(
        model=model,
        loader=loader,
        optimizer=OptimizerConfig(name="sgd", lr=0.01, schedule="constant"),
        workspace=str(tmp_path),
        epochs=2,
        use_mesh=False,
        prepare_batch=prep,
        fuse_prepare=False,
    )
    tr.train(resume=False)
    # first call is the init probe at step 0; afterwards steps advance
    assert seen[0] == 0
    assert seen[-1] > seen[1]


def test_augment_stream_depends_on_seed():
    """Two experiments with different seeds get different augment streams;
    the same (seed, step) reproduces exactly (VERDICT r1 weak #7)."""
    from megreader_tpu.experiment import Experiment

    cs = Charset()
    ds = SyntheticRecognitionDataset(n=8)
    raw = recognition_collate([ds[i] for i in range(4)], cs)

    def stream(seed, step):
        exp = Experiment(
            model=CTCRecognizer(num_classes=cs.num_classes, hidden=32,
                                num_encoder_layers=1),
            train_dataset=ds,
            augment=True,
            seed=seed,
            use_mesh=False,
        )
        return np.asarray(exp.prepare(dict(raw), step=step)["image"])

    a = stream(0, 5)
    b = stream(1, 5)
    c = stream(0, 5)
    assert not np.allclose(a, b)
    np.testing.assert_array_equal(a, c)


def test_bf16_mixed_precision_training(tiny_setup):
    """compute_dtype='bfloat16': fp32 params, bf16 matmuls - loss close to
    fp32 and one SGD step stays finite with fp32 param dtypes preserved."""
    cs, loader, model32 = tiny_setup
    model16 = CTCRecognizer(
        num_classes=cs.num_classes, hidden=32, num_encoder_layers=1,
        compute_dtype="bfloat16",
    )
    batch = _prep(next(iter(loader)))
    v32 = model32.net.init(jax.random.PRNGKey(0), batch["image"])
    v16 = model16.net.init(jax.random.PRNGKey(0), batch["image"])
    # same param tree and fp32 dtypes regardless of compute dtype
    s32 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), v32)
    s16 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), v16)
    assert s32 == s16
    for leaf in jax.tree_util.tree_leaves(v16["params"]):
        assert leaf.dtype == jnp.float32

    l32, _ = model32.loss(v32, batch, train=False)
    l16, _ = model16.loss(v16, batch, train=False)
    assert np.isfinite(float(l16))
    np.testing.assert_allclose(float(l16), float(l32), rtol=0.05)

    tx = OptimizerConfig(name="sgd", lr=0.01, schedule="constant").make()
    state = create_train_state(model16, jax.random.PRNGKey(0), batch, tx)
    step_fn = make_train_step(model16, tx, mesh=None, donate=False)
    state, m = step_fn(state, batch)
    assert np.isfinite(float(m["loss"]))
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32


def test_bf16_detector_training_step():
    from megreader_tpu.models.detector import SegDetector

    det = SegDetector(fpn_dim=32, head_dim=8, compute_dtype="bfloat16")
    B, H, W = 2, 64, 64
    rng = np.random.default_rng(0)
    gt = np.zeros((B, H, W), np.float32)
    gt[:, 20:30, 10:40] = 1.0
    batch = {
        "image": jnp.asarray(rng.random((B, H, W, 3)), jnp.float32),
        "gt": jnp.asarray(gt),
        "mask": jnp.ones((B, H, W), jnp.float32),
        "thresh_map": jnp.asarray(gt * 0.5),
        "thresh_mask": jnp.asarray(gt),
    }
    tx = OptimizerConfig(name="sgd", lr=0.007, schedule="constant").make()
    state = create_train_state(det, jax.random.PRNGKey(0), batch, tx)
    step = make_train_step(det, tx, mesh=None, donate=False)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    maps = det.net.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["image"], train=False,
    )
    assert maps["prob"].dtype == jnp.float32
