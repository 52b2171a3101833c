#!/usr/bin/env python
"""Shared-trunk spotter vs crop pipeline: pages/s + e2e recall (VERDICT r3 #6).

Same held-out rotated/perspective synthetic pages through:
  A. SpotterE2EPipeline — ONE trunk pass: detect on its prob head, pool
     word features from the SAME fused map (DeformRoIPooling), CTC.
  B. E2EPipeline (crop pipeline) — detector trunk for maps, then K
     perspective-rectified pixel crops through a separate recognizer CNN.

Either outcome is a result: the spotter amortizes the trunk, the crop
pipeline re-ingests pixels but its crop recognizer is small and batched.

Checkpoints: /tmp/exp/shared_spotter (cli.train shared_spotter_synth.yaml)
and the cached eval_e2e det+rec pair.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def _load_ckpt(config):
    import jax

    from megreader_tpu.experiment import Experiment
    from megreader_tpu.train import CheckpointManager

    exp = Experiment.from_yaml(config)
    first = exp.prepare(next(iter(exp.eval_loader or exp.train_loader)))
    variables = exp.model.init(jax.random.PRNGKey(0), first["image"])
    variables = CheckpointManager(exp.workspace).restore_variables(variables)
    return exp, variables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=96)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hard", action="store_true",
                    help="run the A/B on HARD pages with hard-trained arms "
                         "(VERDICT r4 weak #4: the easy-page recall of 1.0000 "
                         "is saturation, not signal)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(__file__.rsplit("/", 2)[0], "runs", "jax_cache"),
    )
    from eval_e2e import train_models

    import megreader_tpu.all  # noqa: F401
    from megreader_tpu.data import SyntheticDetectionDataset
    from megreader_tpu.experiment import Experiment
    from megreader_tpu.ops.precision import cast_floats
    from megreader_tpu.pipelines import E2EPipeline
    from megreader_tpu.pipelines.spotter_e2e import SpotterE2EPipeline
    from megreader_tpu.train import CheckpointManager

    # A: spotter
    sp_cfg = ("experiments/shared_spotter_hard.yaml" if args.hard
              else "experiments/shared_spotter_synth.yaml")
    sp_exp = Experiment.from_yaml(sp_cfg)
    first = sp_exp.prepare(next(iter(sp_exp.eval_loader)))
    sp_vars = sp_exp.model.init(
        jax.random.PRNGKey(0), first["image"], first["rois"]
    )
    sp_vars = CheckpointManager(sp_exp.workspace).restore_variables(sp_vars)
    sp_vars = cast_floats(sp_vars, jnp.bfloat16)
    spipe = SpotterE2EPipeline(
        sp_exp.model, charset=sp_exp.charset, max_regions=16, bf16=True
    )

    # B: crop pipeline — arms from the SAME training distribution as A
    if args.hard:
        det_exp, det_vars = _load_ckpt("experiments/seg_detector_hard.yaml")
        rec_exp, rec_vars = _load_ckpt("experiments/ctc_hard_mix.yaml")
        det, rec, cs = det_exp.model, rec_exp.model, rec_exp.charset
    else:
        det, det_vars, rec, rec_vars, cs = train_models()
    cpipe = E2EPipeline(det, rec, charset=cs, max_regions=16,
                        rectify="perspective", bf16=True)

    if args.hard:
        from megreader_tpu.data.hard_synth import HardSyntheticDetectionDataset

        ds = HardSyntheticDetectionDataset(
            n=args.pages, seed=9500, gt_maps=False, curve_prob=0.0,
            max_rotate=15.0,
        )
    else:
        ds = SyntheticDetectionDataset(
            n=args.pages, seed=9500, gt_maps=False, max_rotate=15,
            max_persp=0.05,
        )
    batches = []
    gt_sets = []
    for s in range(0, args.pages, args.batch):
        samples = [ds[i] for i in range(s, min(s + args.batch, args.pages))]
        batches.append(jnp.asarray(
            np.stack([x["image"] for x in samples]).astype(np.float32)
        ))
        gt_sets.append([[cs.normalize(t) for t in x["texts"]] for x in samples])

    def recall(predict):
        hit = tot = 0
        for pages, gts in zip(batches, gt_sets):
            results = predict(pages)
            for preds, gt in zip(results, gts):
                pred_words = [p["text"] for p in preds]
                tot += len(gt)
                for w in gt:
                    if w in pred_words:
                        pred_words.remove(w)
                        hit += 1
        return round(hit / max(tot, 1), 4), tot

    def throughput(run_fn, consts):
        """slope-timed pages/s of a jitted page program."""
        pages = batches[0]

        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(pages, iters):
            def body(carry, _):
                out = run_fn(*consts, pages + carry * 1e-6)
                c = (jnp.sum(out["ids"]) + jnp.sum(out["lengths"])).astype(
                    jnp.float32
                )
                return c * 1e-9, None

            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return out

        def timed(iters):
            t0 = time.perf_counter()
            float(loop(pages, iters))
            return time.perf_counter() - t0

        timed(2); timed(10)
        t1 = min(timed(2) for _ in range(3))
        t2 = min(timed(10) for _ in range(3))
        per_batch = (t2 - t1) / 8
        return pages.shape[0] / per_batch

    sp_recall, total = recall(lambda p: spipe.predict(sp_vars, p))
    cp_recall, _ = recall(lambda p: cpipe.predict(det_vars, rec_vars, p))

    srun = spipe.build()
    crun = cpipe.build()
    bf_sp = cast_floats(sp_vars, jnp.bfloat16)
    bf_d = cast_floats(det_vars, jnp.bfloat16)
    bf_r = cast_floats(rec_vars, jnp.bfloat16)
    sp_pps = throughput(srun, (bf_sp,))
    cp_pps = throughput(crun, (bf_d, bf_r))

    print(json.dumps({
        "tier": "hard" if args.hard else "easy",
        "pages": args.pages, "total_words": total, "batch": args.batch,
        "spotter": {"pages_per_sec": round(sp_pps, 1), "e2e_recall": sp_recall},
        "crop_pipeline": {"pages_per_sec": round(cp_pps, 1),
                          "e2e_recall": cp_recall},
    }, indent=1))


if __name__ == "__main__":
    main()
