#!/usr/bin/env python
"""Attribute the composed-pipeline recognition loss: domain shift vs
localization error.

The convergence probe (scripts/convergence.py) shows detection is NOT the
e2e ceiling (det recall ~99%) — the loss is rec|det (~85% on upright box
crops) even though the same recognizer reads its own crop distribution at
100%. Two candidate causes:

  a) crop-DOMAIN shift: page-rendered words (page fonts/scales/colors,
     resampling through the page then the crop resize) differ from the
     recognizer's training crops;
  b) LOCALIZATION error: detected quads are slightly off (unclip margin,
     CCL extents), cutting letters or admitting neighbors.

This isolates (a) by recognizing GT-box crops — perfect localization,
pipeline crop geometry (same crop_resize_boxes + margin as E2EPipeline).
If GT-box accuracy ~= pipeline rec|det, the loss is domain shift; if ~=
crop-eval accuracy (1.0), it's localization.

Runs entirely on CPU (restores the TPU checkpoints host-side) so it can
share the machine with a training run.
"""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

REPO = __file__.rsplit("/", 2)[0]


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from megreader_tpu.core import Charset
    from megreader_tpu.data import SyntheticDetectionDataset
    from megreader_tpu.models import CTCRecognizer
    from megreader_tpu.ops.ctc import ctc_greedy_decode
    from megreader_tpu.ops.image import crop_resize_boxes, normalize, rectify_quads_mxu
    from megreader_tpu.train import CheckpointManager

    cs = Charset()
    rec = CTCRecognizer(num_classes=cs.num_classes)
    rec_vars = rec.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 100, 3)))
    ws = os.path.join(REPO, "runs", "eval_e2e", "rec_conv")
    if not os.path.isdir(os.path.join(ws, "checkpoints")):
        ws = os.path.join(REPO, "runs", "eval_e2e", "rec")
    rec_vars = CheckpointManager(ws).restore_variables_host(rec_vars)

    @jax.jit
    def read_crops(crops):
        logits = rec.net.apply(rec_vars, normalize(crops), train=False)
        T = logits.shape[1]
        return ctc_greedy_decode(logits, jnp.full((crops.shape[0],), T, jnp.int32))

    for set_name, kwargs in (
        ("upright", {}),
        ("rotated", {"max_rotate": 25, "max_persp": 0.08}),
    ):
        ds = SyntheticDetectionDataset(
            n=32, seed=900 if set_name == "upright" else 901, gt_maps=False,
            **kwargs,
        )
        hit_box = hit_persp = tot = 0
        for i in range(len(ds)):
            s = ds[i]
            polys = np.asarray(s["polygons"], np.float32)  # (P, 4, 2)
            keep = ~np.asarray(s["ignore"])
            polys, texts = polys[keep], [
                t for t, k in zip(s["texts"], keep) if k
            ]
            if len(texts) == 0:
                continue
            page = jnp.asarray(s["image"][None].astype(np.float32))
            m = 4.0
            x0 = polys[..., 0].min(-1) - m
            x1 = polys[..., 0].max(-1) + m
            y0 = polys[..., 1].min(-1) - m
            y1 = polys[..., 1].max(-1) + m
            boxes = jnp.asarray(
                np.stack([x0, y0, x1, y1], -1)[None], jnp.float32
            )
            crops = crop_resize_boxes(page, boxes, (32, 100), aspect="preserve_h")
            crops = crops.reshape(-1, 32, 100, 3)
            ids, lens = read_crops(crops)
            preds = [
                cs.decode(np.asarray(ids[k])[: int(lens[k])])
                for k in range(len(texts))
            ]
            # perspective-rectified GT quads (pipeline margin rule)
            c = polys.mean(-2, keepdims=True)
            qm = polys + np.sign(polys - c) * (m * 0.5)
            crops_p = rectify_quads_mxu(
                page, jnp.asarray(qm[None]), (32, 100), aspect="preserve_h"
            ).reshape(-1, 32, 100, 3)
            ids_p, lens_p = read_crops(crops_p)
            preds_p = [
                cs.decode(np.asarray(ids_p[k])[: int(lens_p[k])])
                for k in range(len(texts))
            ]
            for t, pb, pp in zip(texts, preds, preds_p):
                t = cs.normalize(t)
                tot += 1
                hit_box += int(pb == t)
                hit_persp += int(pp == t)
        print(
            f"{set_name}: GT-box acc {hit_box / tot:.4f}, "
            f"GT-persp acc {hit_persp / tot:.4f}  (n={tot})"
        )


if __name__ == "__main__":
    main()
