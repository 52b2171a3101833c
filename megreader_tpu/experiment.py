"""Experiment: wire a YAML config into model/data/trainer/eval objects.

Role of the reference's ``experiment.py`` [U] (SURVEY.md §2.1): the
top-level object graph — structure (model + representer + measurer +
visualizer), train settings (loader, optimizer, checkpoints, epochs),
validation/evaluation settings, logger. Components are instantiated by the
``class:`` registry (core/config.py); this module adds the task-aware glue
(collate fns, device batch prep) that YAML can't express.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from .core.charset import AttentionCharset, Charset
from .core.config import Config
from .core.registry import register
from .data.loader import (
    Loader,
    detection_collate,
    detection_collate_polys,
    recognition_collate,
    spotting_collate,
)
from .ops.image import normalize, resize_with_aspect_pad
from .train.train_step import OptimizerConfig
from .train.trainer import Trainer

RECOGNITION_TASKS = {"CTCRecognizer", "Ctc2dRecognizer", "AttentionRecognizer"}
DETECTION_TASKS = {"SegDetector"}
SPOTTING_TASKS = {"RoITextSpotter", "SharedTrunkSpotter"}


def _recognition_prepare(batch: Dict, crop_hw=(32, 100), augment_rng=None) -> Dict:
    # uint8 over the wire, cast on device.
    images = jnp.asarray(batch["image"]).astype(jnp.float32)
    sizes = jnp.asarray(batch["size"])
    if augment_rng is not None:
        from .ops.image import augment_resize_with_aspect_pad

        img, _w = augment_resize_with_aspect_pad(
            augment_rng, images, sizes, tuple(crop_hw)
        )
    else:
        img, _w = resize_with_aspect_pad(images, sizes, tuple(crop_hw))
    return {
        "image": normalize(img),
        "label": jnp.asarray(batch["label"]),
        "label_length": jnp.asarray(batch["label_length"]),
    }


def _detection_prepare(batch: Dict) -> Dict:
    # Transfer compact dtypes (uint8/f16 from detection_collate), cast on
    # device — 4x less host->device traffic.
    return {
        "image": normalize(jnp.asarray(batch["image"]).astype(jnp.float32)),
        "gt": jnp.asarray(batch["gt"]).astype(jnp.float32),
        "mask": jnp.asarray(batch["mask"]).astype(jnp.float32),
        "thresh_map": jnp.asarray(batch["thresh_map"]).astype(jnp.float32),
        "thresh_mask": jnp.asarray(batch["thresh_mask"]).astype(jnp.float32),
    }


def _detection_prepare_device(batch: Dict, gt_kwargs: Optional[Dict] = None) -> Dict:
    """Device-GT path: ship polygons, rasterize shrink/border maps on device
    (ops/gt_maps.py) — removes the host cv2 bottleneck (VERDICT r1 #4).

    ``gt_kwargs`` carries the dataset's GT geometry config (shrink_ratio,
    min_text_size, thresh range) so the device targets match what the host
    cv2 path would produce for the same dataset — a dataset configured with
    a non-default shrink_ratio must not silently train against 0.4
    (ADVICE r2 #2).
    """
    from .ops.gt_maps import make_detection_gt

    image = jnp.asarray(batch["image"]).astype(jnp.float32)
    if "gt" in batch:  # dataset still emitting host maps: pass them through
        return _detection_prepare(batch)
    maps = make_detection_gt(
        jnp.asarray(batch["polys"]),
        jnp.asarray(batch["poly_valid"]),
        jnp.asarray(batch["poly_ignore"]),
        hw=(image.shape[1], image.shape[2]),
        **(gt_kwargs or {}),
    )
    out = {"image": normalize(image)}
    out.update(maps)
    return out


def _spotting_prepare(batch: Dict, box_margin: float = 2.0) -> Dict:
    """RoI spotting: polygons -> axis-aligned boxes with a small margin
    (matching the e2e crop margin role); labels pass through. When the
    batch also carries detection GT maps (SharedTrunkSpotter joint
    training), they ride along with the detection prepare's dtype casts."""
    image = normalize(jnp.asarray(batch["image"]).astype(jnp.float32))
    polys = jnp.asarray(batch["polys"])  # (B, P, 4, 2)
    H, W = image.shape[1], image.shape[2]
    m = box_margin
    x0 = jnp.clip(jnp.min(polys[..., 0], axis=-1) - m, 0, W - 1)
    x1 = jnp.clip(jnp.max(polys[..., 0], axis=-1) + m, 1, W)
    y0 = jnp.clip(jnp.min(polys[..., 1], axis=-1) - m, 0, H - 1)
    y1 = jnp.clip(jnp.max(polys[..., 1], axis=-1) + m, 1, H)
    out = {
        "image": image,
        "rois": jnp.stack([x0, y0, x1, y1], axis=-1),
        "roi_valid": jnp.asarray(batch["poly_valid"])
        & ~jnp.asarray(batch["poly_ignore"]),
        "label": jnp.asarray(batch["label"]),
        "label_length": jnp.asarray(batch["label_length"]),
    }
    for k in ("gt", "mask", "thresh_map", "thresh_mask"):
        if k in batch:
            out[k] = jnp.asarray(batch[k]).astype(jnp.float32)
    return out


@register
class Experiment:
    """Built from YAML: model + dataset + optimizer + trainer wiring."""

    def __init__(
        self,
        model,
        train_dataset=None,
        eval_dataset=None,
        optimizer: Optional[OptimizerConfig] = None,
        charset=None,
        workspace: str = "/tmp/megreader_tpu_exp",
        batch_size: int = 64,
        epochs: int = 10,
        crop_hw=(32, 100),
        max_label_len: int = 32,
        log_every: int = 50,
        use_mesh: bool = True,
        augment: bool = False,
        validate_every_steps: int = 0,
        seed: int = 0,
        device_gt: bool = True,
        max_polys: int = 16,
        loader_workers: int = 4,
        loader_worker_mode: str = "thread",
        name: str = "exp",
    ):
        self.model = model
        self.task = model.__class__.__name__
        self.workspace = workspace
        self.name = name
        self.crop_hw = tuple(crop_hw)

        if charset is None:
            charset = AttentionCharset() if self.task == "AttentionRecognizer" else Charset()
        self.charset = charset

        if self.task in RECOGNITION_TASKS:
            collate = functools.partial(
                recognition_collate, charset=self.charset, max_label_len=max_label_len
            )
            if augment:
                import jax

                # Augment stream keyed by (experiment seed, trainer step):
                # different seeds give different augmentations, and the key
                # is pure in (seed, step) — no mutable wrapper state, safe
                # under concurrent/prefetched prepare calls.
                base_key = jax.random.PRNGKey(seed)

                def prepare(batch, step=0, _crop_hw=self.crop_hw):
                    rng = jax.random.fold_in(base_key, step)
                    return _recognition_prepare(
                        batch, crop_hw=_crop_hw, augment_rng=rng
                    )

            else:
                prepare = functools.partial(_recognition_prepare, crop_hw=self.crop_hw)
        elif self.task in DETECTION_TASKS:
            if device_gt:
                collate = functools.partial(
                    detection_collate_polys, max_polys=max_polys
                )
                # honor the dataset's GT geometry config on the device path
                gt_kwargs = {}
                for attr in ("shrink_ratio", "min_text_size", "thresh_min", "thresh_max"):
                    v = getattr(train_dataset, attr, None)
                    if v is not None:
                        gt_kwargs[attr] = float(v)
                prepare = functools.partial(
                    _detection_prepare_device, gt_kwargs=gt_kwargs
                )
                for ds in (train_dataset, eval_dataset):
                    if ds is not None and hasattr(ds, "gt_maps"):
                        ds.gt_maps = False  # skip the host cv2 rasterization
            else:
                collate = detection_collate
                prepare = _detection_prepare
        elif self.task in SPOTTING_TASKS:
            collate = functools.partial(
                spotting_collate,
                charset=self.charset,
                max_polys=max_polys,
                max_label_len=max_label_len,
            )
            prepare = _spotting_prepare
            # RoITextSpotter needs polygons+texts only; the joint
            # SharedTrunkSpotter ALSO trains its detection heads, so it
            # keeps the dataset's host GT maps flowing through the collate
            if self.task != "SharedTrunkSpotter":
                for ds in (train_dataset, eval_dataset):
                    if ds is not None and hasattr(ds, "gt_maps"):
                        ds.gt_maps = False
        else:
            raise ValueError(f"unknown task for model {self.task}")
        self.collate = collate
        self.prepare = prepare

        self.train_loader = (
            Loader(
                train_dataset, batch_size, collate, shuffle=True,
                host_shard=True, workers=loader_workers,
                worker_mode=loader_worker_mode,
            )
            if train_dataset is not None
            else None
        )
        self.eval_loader = (
            Loader(
                eval_dataset, batch_size, collate, shuffle=False,
                drop_last=False, workers=loader_workers,
                worker_mode=loader_worker_mode,
            )
            if eval_dataset is not None
            else None
        )
        self.optimizer = optimizer or OptimizerConfig()
        self.seed = seed
        self.epochs = epochs
        self.log_every = log_every
        self.use_mesh = use_mesh
        self.validate_every_steps = validate_every_steps

    def make_trainer(self) -> Trainer:
        assert self.train_loader is not None, "experiment has no train dataset"
        validate_fn = None
        if self.validate_every_steps and self.eval_loader is not None:
            def validate_fn(model, state):
                from .evaluation import evaluate

                variables = {"params": state.params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                return evaluate(self, variables)

        return Trainer(
            model=self.model,
            loader=self.train_loader,
            optimizer=self.optimizer,
            workspace=self.workspace,
            epochs=self.epochs,
            log_every=self.log_every,
            use_mesh=self.use_mesh,
            prepare_batch=self.prepare,
            validate_every_steps=self.validate_every_steps,
            validate_fn=validate_fn,
            seed=self.seed,
        )

    @staticmethod
    def from_yaml(path: str, overrides: Optional[Dict[str, Any]] = None) -> "Experiment":
        # Self-register the component catalog: scripts that import a helper
        # (e.g. bench_spotter._load_ckpt) without going through a CLI entry
        # would otherwise hit "unknown component" on the first class: node.
        from . import all as _all  # noqa: F401  (idempotent registry fill)

        graph = Config.build(path, overrides)
        exp = graph.get("experiment") if isinstance(graph, dict) else graph
        if not isinstance(exp, Experiment):
            raise ValueError(f"{path} must define an 'experiment:' node with class: Experiment")
        return exp
