"""RoI text spotter: deformable-RoI-pooled spotting (models/spotter.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import megreader_tpu.all  # noqa: F401
from megreader_tpu.models.spotter import RoITextSpotter


def _toy_batch(B=2, P=3, H=64, W=96, L=8):
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)
    x0 = rng.uniform(0, W - 40, (B, P))
    y0 = rng.uniform(0, H - 20, (B, P))
    rois = jnp.asarray(
        np.stack([x0, y0, x0 + 36, y0 + 14], axis=-1), jnp.float32
    )
    labels = jnp.asarray(rng.integers(1, 10, (B, P, L)), jnp.int32)
    lengths = jnp.asarray(rng.integers(2, 6, (B, P)), jnp.int32)
    valid = jnp.asarray([[True, True, False], [True, False, False]])
    return {
        "image": image, "rois": rois, "roi_valid": valid,
        "label": labels, "label_length": lengths,
    }


def test_spotter_shapes_and_masked_loss():
    model = RoITextSpotter(num_classes=12, fpn_dim=32, pool_hw=(2, 16), hidden=16)
    batch = _toy_batch()
    v = model.init(jax.random.PRNGKey(0), batch["image"], batch["rois"])
    logits = model.apply(v, batch["image"], batch["rois"])
    assert logits.shape == (2, 3, 16, 12)
    # deformable pooling params exist (offset head zero-init)
    assert "roi_pool" in v["params"]
    assert np.all(np.asarray(v["params"]["roi_pool"]["trans_fc2"]["kernel"]) == 0)

    loss, (metrics, _) = model.loss(v, batch, train=True)
    assert np.isfinite(float(loss))
    assert int(metrics["n_rois"]) == 3  # only valid slots count

    # invalid slots must not influence the loss: perturb their labels
    batch2 = dict(batch)
    batch2["label"] = batch["label"].at[1, 2].set(7)
    batch2["label_length"] = batch["label_length"].at[1, 2].set(9)
    loss2, _ = model.loss(v, batch2, train=True)
    assert float(loss) == pytest.approx(float(loss2), abs=1e-6)


def test_spotter_decode_and_grad_step():
    import optax

    model = RoITextSpotter(num_classes=12, fpn_dim=32, pool_hw=(2, 16), hidden=16)
    batch = _toy_batch()
    v = model.init(jax.random.PRNGKey(0), batch["image"], batch["rois"])
    ids, lens = model.decode(v, batch["image"], batch["rois"])
    assert ids.shape == (2, 3, 16) and lens.shape == (2, 3)

    # a couple of gradient steps reduce the masked CTC loss
    tx = optax.adam(3e-3)
    params = v["params"]
    opt = tx.init(params)

    def loss_fn(p):
        vars_ = {"params": p, "batch_stats": v.get("batch_stats", {})}
        loss, (m, _) = model.loss(vars_, batch, train=True)
        return loss

    l0 = None
    for _ in range(3):
        loss, g = jax.value_and_grad(loss_fn)(params)
        if l0 is None:
            l0 = float(loss)
        upd, opt = tx.update(g, opt)
        params = optax.apply_updates(params, upd)
    assert float(loss_fn(params)) < l0


def test_spotting_experiment_wiring(tmp_path):
    """Collate + prepare produce the batch the spotter consumes, from the
    synthetic page dataset's polygons+texts."""
    from megreader_tpu.data import SyntheticDetectionDataset
    from megreader_tpu.experiment import Experiment

    exp = Experiment(
        model=RoITextSpotter(num_classes=37, fpn_dim=32, pool_hw=(2, 16), hidden=16),
        train_dataset=SyntheticDetectionDataset(n=4, hw=(128, 128), seed=3),
        batch_size=2,
        epochs=1,
        workspace=str(tmp_path),
        use_mesh=False,
        max_label_len=16,
    )
    b = next(iter(exp.train_loader))
    prepped = exp.prepare(b)
    B, P, _ = prepped["rois"].shape
    assert prepped["image"].shape[0] == 2 and prepped["rois"].shape[-1] == 4
    assert prepped["label"].shape == (B, P, 16)
    # roi boxes must cover their polygons
    polys = np.asarray(b["polys"])
    rois = np.asarray(prepped["rois"])
    valid = np.asarray(prepped["roi_valid"])
    for bb in range(B):
        for k in range(P):
            if not valid[bb, k]:
                continue
            assert rois[bb, k, 0] <= polys[bb, k, :, 0].min()
            assert rois[bb, k, 2] >= polys[bb, k, :, 0].max()
    loss, _ = exp.model.loss(
        exp.model.init(jax.random.PRNGKey(0), prepped["image"], prepped["rois"]),
        prepped,
        train=True,
    )
    assert np.isfinite(float(loss))


# ---------------------------------------------------------------------------
# SharedTrunkSpotter: one trunk feeding detection heads + RoI recognition
# ---------------------------------------------------------------------------


def test_shared_spotter_joint_loss_and_decode():
    from megreader_tpu.models.spotter import SharedTrunkSpotter

    B, P, H, W, L = 2, 3, 64, 96, 8
    model = SharedTrunkSpotter(num_classes=11, fpn_dim=32, head_dim=8,
                               pool_hw=(2, 8), hidden=16)
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, H, W, 3)), jnp.float32),
        "rois": jnp.asarray(
            np.tile([[4.0, 4.0, 60.0, 20.0]], (B, P, 1)), jnp.float32
        ),
        "roi_valid": jnp.ones((B, P), bool),
        "label": jnp.asarray(rng.integers(1, 11, (B, P, L)), jnp.int32),
        "label_length": jnp.full((B, P), L, jnp.int32),
        "gt": jnp.zeros((B, H, W), jnp.float32).at[:, 8:16, 8:40].set(1.0),
        "mask": jnp.ones((B, H, W), jnp.float32),
        "thresh_map": jnp.full((B, H, W), 0.3, jnp.float32),
        "thresh_mask": jnp.zeros((B, H, W), jnp.float32).at[:, 6:18, 6:42].set(1.0),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["image"], batch["rois"])
    loss, (metrics, new_state) = model.loss(variables, batch, train=True)
    assert np.isfinite(float(loss))
    # the joint loss carries BOTH task terms
    assert {"bce", "dice", "thresh_l1", "ctc"} <= set(metrics)
    assert float(metrics["ctc"]) > 0 and float(metrics["bce"]) > 0
    assert "batch_stats" in new_state

    ids, lens = model.decode(variables, batch["image"], batch["rois"])
    assert ids.shape[:2] == (B, P) and lens.shape == (B, P)

    # detection-only forward returns maps without touching the RoI branch
    maps = model.apply(variables, batch["image"], heads=("prob",))
    assert maps["prob"].shape == (B, H, W)


def test_spotter_e2e_pipeline_one_program():
    from megreader_tpu.models.spotter import SharedTrunkSpotter
    from megreader_tpu.pipelines.spotter_e2e import SpotterE2EPipeline

    B, H, W = 2, 64, 96
    model = SharedTrunkSpotter(num_classes=11, fpn_dim=32, head_dim=8,
                               pool_hw=(2, 8), hidden=16)
    rng = np.random.default_rng(1)
    pages = jnp.asarray(rng.random((B, H, W, 3)) * 255.0, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), pages)
    pipe = SpotterE2EPipeline(model, max_regions=4, box_thresh=0.0)
    run = pipe.build()
    out = run(variables, pages)
    assert out["ids"].shape[:2] == (B, 4)
    assert out["quads"].shape == (B, 4, 4, 2)
    assert np.isfinite(np.asarray(out["quads"])).all()
    assert pipe.resolved_impls["ccl"] in ("xla", "pallas")
    # predict() surfaces host dicts
    res = pipe.predict(variables, pages)
    assert len(res) == B


def test_shared_spotter_experiment_wiring(tmp_path):
    """Joint collate/prepare: GT maps AND RoI labels in one batch."""
    from megreader_tpu.data import SyntheticDetectionDataset
    from megreader_tpu.experiment import Experiment
    from megreader_tpu.models.spotter import SharedTrunkSpotter

    ds = SyntheticDetectionDataset(n=4, hw=(64, 64), seed=0, gt_maps=True)
    exp = Experiment(
        model=SharedTrunkSpotter(num_classes=37, fpn_dim=32, head_dim=8,
                                 pool_hw=(2, 8), hidden=16),
        train_dataset=ds,
        batch_size=2,
        workspace=str(tmp_path),
        use_mesh=False,
        max_label_len=16,
    )
    assert ds.gt_maps  # joint task keeps host GT maps ON
    b = next(iter(exp.train_loader))
    prepped = exp.prepare(b)
    for k in ("gt", "mask", "thresh_map", "thresh_mask", "rois", "label"):
        assert k in prepped, k
    loss, (metrics, _) = exp.model.loss(
        exp.model.init(jax.random.PRNGKey(0), prepped["image"], prepped["rois"]),
        prepped,
        train=True,
    )
    assert np.isfinite(float(loss))
