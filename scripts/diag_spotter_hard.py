#!/usr/bin/env python
"""Why does the hard-trained spotter read ~0 at eval? Print raw preds."""
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
from megreader_tpu.experiment import Experiment
from megreader_tpu.train import CheckpointManager
from megreader_tpu.ops.precision import cast_floats
from megreader_tpu.pipelines.spotter_e2e import SpotterE2EPipeline
from megreader_tpu.data.hard_synth import HardSyntheticDetectionDataset


def main():
    sp_exp = Experiment.from_yaml("experiments/shared_spotter_hard.yaml")
    first = sp_exp.prepare(next(iter(sp_exp.eval_loader)))
    sp_vars = sp_exp.model.init(
        jax.random.PRNGKey(0), first["image"], first["rois"]
    )
    sp_vars = CheckpointManager(sp_exp.workspace).restore_variables(sp_vars)
    sp_vars = cast_floats(sp_vars, jnp.bfloat16)
    spipe = SpotterE2EPipeline(
        sp_exp.model, charset=sp_exp.charset, max_regions=16, bf16=True
    )
    ds = HardSyntheticDetectionDataset(
        n=4, seed=9500, gt_maps=False, curve_prob=0.0, max_rotate=15.0
    )
    samples = [ds[i] for i in range(2)]
    pages = jnp.asarray(
        np.stack([x["image"] for x in samples]).astype(np.float32)
    )
    results = spipe.predict(sp_vars, pages)
    for smp, preds in zip(samples, results):
        print("GT:", [sp_exp.charset.normalize(t) for t in smp["texts"]])
        print("preds:", [(p["text"], round(float(p["score"]), 3)) for p in preds])


if __name__ == "__main__":
    main()
