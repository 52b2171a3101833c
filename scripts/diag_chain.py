#!/usr/bin/env python
"""Diagnose the chain rectify path on curved-only hard pages.

Mirrors E2EPipeline.build()'s chain branch step by step (outside jit) and
dumps per-stage intermediates: chain geometry, band quads, stretched
slices, final crops, decoded text vs GT.
"""
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

import megreader_tpu.all  # noqa: F401

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import cv2

from megreader_tpu.experiment import Experiment
from megreader_tpu.train import CheckpointManager
from megreader_tpu.data.hard_synth import HardSyntheticDetectionDataset
from megreader_tpu.ops.ccl import (
    connected_components, extract_regions, regions_to_quads,
    unclip_distance_inverse,
)
from megreader_tpu.ops.chains import (
    chain_arc_length, chains_to_band_quads, extract_chains, resample_width,
)
from megreader_tpu.ops.image import rectify_quads_mxu, normalize


def _load(config):
    exp = Experiment.from_yaml(config)
    first = exp.prepare(next(iter(exp.eval_loader or exp.train_loader)))
    variables = exp.model.init(jax.random.PRNGKey(0), first["image"])
    variables = CheckpointManager(exp.workspace).restore_variables(variables)
    return exp, variables

def main():


    det_exp, det_vars = _load("experiments/seg_detector_hard.yaml")
    rec_exp, rec_vars = _load("experiments/ctc_hard.yaml")
    cs = rec_exp.charset

    ds = HardSyntheticDetectionDataset(
        n=8, seed=9200, gt_maps=False, curve_prob=1.0,
        max_rotate=0.0, min_height=18, max_height=44, degrade=0.4,
    )
    samples = [ds[i] for i in range(4)]
    pages = jnp.asarray(np.stack([x["image"] for x in samples]).astype(np.float32))

    B, H, W, _ = pages.shape
    K, S = 16, 8
    Ho, Wo = 32, 100
    m = 4.0

    x = normalize(pages).astype(jnp.bfloat16)
    maps = det_exp.model.net.apply(det_vars, x, train=False, heads=("prob",))
    prob = maps["prob"].astype(jnp.float32)
    mask = prob > 0.3
    labels = connected_components(mask, max_iters=24, impl="xla")
    stats = extract_regions(labels, prob, max_regions=K, impl="xla")
    d = unclip_distance_inverse(stats, shrink_ratio=0.4)
    quads = regions_to_quads(stats, d)
    valid = np.asarray(stats["valid"] & (stats["score"] >= 0.5) & (stats["area"] >= 8.0))

    chains = extract_chains(labels, stats, n_bands=S)
    dm = d + m * 0.5
    band_quads = chains_to_band_quads(chains, dm)

    Wb = max(Wo // S, 8)
    slices = rectify_quads_mxu(
        pages, band_quads.reshape(B, K * S, 4, 2), (Ho, Wb),
        crop_hw=(48, 64), aspect="stretch", warp="bilinear",
    )
    stretched = (
        np.asarray(slices).reshape(B, K, S, Ho, Wb, 3)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, K, Ho, S * Wb, 3)
    )
    L = chain_arc_length(chains, dm)
    th = 2.0 * (jnp.mean(chains["half_h"], axis=-1) + dm)
    tw = jnp.clip(jnp.round(L * Ho / jnp.maximum(th, 1.0)), 2.0, float(Wo))
    crops_chain = np.asarray(
        resample_width(jnp.asarray(stretched), tw, Wo)
    )  # (B, K, Ho, Wo, 3)

    # perspective for comparison
    c = quads.mean(axis=-2, keepdims=True)
    qm = quads + jnp.sign(quads - c) * (m * 0.5)
    crops_persp = np.asarray(
        rectify_quads_mxu(pages, qm, (Ho, Wo), aspect="preserve_h")
    )

    # decode both
    def decode(crops):
        cr = normalize(jnp.asarray(crops.reshape(B * K, Ho, Wo, 3))).astype(jnp.bfloat16)
        ids, lens = rec_exp.model.decode(rec_vars, cr, mode="greedy", beam_width=8)
        ids, lens = np.asarray(ids), np.asarray(lens)
        out = []
        for i in range(B * K):
            out.append(cs.decode(ids[i][: lens[i]]))
        return np.array(out).reshape(B, K)

    txt_chain = decode(crops_chain)
    txt_persp = decode(crops_persp)

    os.makedirs("/tmp/diag_chain", exist_ok=True)
    for b in range(B):
        gt = [cs.normalize(t) for t in samples[b]["texts"]]
        print(f"== page {b}: GT {gt}")
        pg = np.asarray(pages[b]).astype(np.uint8).copy()
        for k in range(K):
            if not valid[b, k]:
                continue
            print(f"  [{b},{k}] persp={txt_persp[b,k]!r} chain={txt_chain[b,k]!r} "
                  f"tw={float(tw[b,k]):.0f} L={float(L[b,k]):.0f} th={float(th[b,k]):.1f} "
                  f"alive={np.asarray(chains['band_alive'][b,k]).astype(int).tolist()}")
            cv2.imwrite(f"/tmp/diag_chain/p{b}_r{k}_chain.png",
                        crops_chain[b, k][..., ::-1])
            cv2.imwrite(f"/tmp/diag_chain/p{b}_r{k}_persp.png",
                        crops_persp[b, k][..., ::-1])
            cv2.imwrite(f"/tmp/diag_chain/p{b}_r{k}_stretched.png",
                        stretched[b, k][..., ::-1])
            # draw band quads on the page
            bq = np.asarray(band_quads[b, k])  # (S, 4, 2)
            for s in range(S):
                cv2.polylines(pg, [bq[s].astype(np.int32)], True, (0, 255, 0), 1)
        cv2.imwrite(f"/tmp/diag_chain/page{b}_bands.png", pg[..., ::-1])
    print("dumped to /tmp/diag_chain")


if __name__ == "__main__":
    main()