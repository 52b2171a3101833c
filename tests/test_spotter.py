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
