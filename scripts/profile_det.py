#!/usr/bin/env python
"""Intra-detector breakdown: trunk vs FPN vs prob head (serving path).

Prefix slope-timing (see bench.py measurement notes): each stage's
marginal cost is the difference between successive prefixes. Also prints
XLA-counted FLOPs and the implied MFU per prefix so the gap between
"where the FLOPs are" and "where the time goes" is visible.

Usage: profile_det.py [--hw 640] [--batch 8] [--backbone resnet18]
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import jax.numpy as jnp

    import bench as _bench
    from megreader_tpu.models.detector import FPNNeck, MapHead, SegDetector
    from megreader_tpu.models.resnet import resnet_variant
    from megreader_tpu.ops.image import normalize
    from megreader_tpu.ops.precision import cast_floats

    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=640)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--backbone", default="resnet18")
    ap.add_argument("--s2d", action="store_true",
                    help="space-to-depth stem (same checkpoints)")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/root/repo/runs/jax_cache")

    B, H, W = args.batch, args.hw, args.hw
    det = SegDetector(backbone=args.backbone, stem_s2d=args.s2d)
    rng = jax.random.PRNGKey(0)
    det_vars = det.init(rng, jnp.zeros((1, H, W, 3)))
    det_vars = cast_floats(det_vars, jnp.bfloat16)

    trunk = resnet_variant(
        args.backbone, "det", dtype=jnp.bfloat16, stem_s2d=args.s2d
    )
    fpn = FPNNeck(det.net.fpn_dim, det.net.fpn_dim, dtype=jnp.bfloat16)
    head = MapHead(det.net.head_dim, dtype=jnp.bfloat16, fused_upsample=True)

    tv = {
        "params": det_vars["params"]["ResNet_0"],
        "batch_stats": det_vars["batch_stats"]["ResNet_0"],
    }
    fv = {"params": det_vars["params"]["fpn"]}
    hv = {
        "params": det_vars["params"]["prob_head"],
        "batch_stats": det_vars["batch_stats"]["prob_head"],
    }

    def f_trunk(x):
        return trunk.apply(tv, x, train=False)[-1]

    def f_fpn(x):
        feats = trunk.apply(tv, x, train=False)
        return fpn.apply(fv, feats)

    def f_head(x):
        feats = trunk.apply(tv, x, train=False)
        fused = fpn.apply(fv, feats)
        return head.apply(hv, fused, train=False)

    def f_full(x):
        return det.net.apply(det_vars, x, train=False, heads=("prob",))["prob"]

    pages = jax.random.uniform(rng, (B, H, W, 3), jnp.float32) * 255.0
    x = normalize(pages).astype(jnp.bfloat16)

    prev = 0.0
    for name, fn in [
        ("trunk(C5)", f_trunk),
        ("trunk+fpn", f_fpn),
        ("trunk+fpn+prob_head", f_head),
        ("serving apply (heads=prob)", f_full),
    ]:
        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(x, iters, fn=fn):
            def body(c, _):
                out = fn(x + c)
                return jnp.sum(out).astype(jnp.bfloat16) * 1e-12, None
            c, _ = jax.lax.scan(body, jnp.bfloat16(0), None, length=iters)
            return c

        def timed(iters):
            t0 = time.perf_counter()
            float(loop(x, iters=iters))
            return time.perf_counter() - t0

        timed(2); timed(10)
        t1 = min(timed(2) for _ in range(3))
        t2 = min(timed(10) for _ in range(3))
        per = (t2 - t1) / 8
        fl = _bench._xla_flops(fn, x)
        mfu = (fl / per / _bench.PEAK_BF16_FLOPS) if fl else None
        marg = per - prev
        print(
            f"{name:28s}: {per*1e3:7.2f} ms/batch  (+{marg*1e3:5.2f})  "
            f"GFLOP={fl/1e9 if fl else -1:8.1f}  MFU={mfu if mfu else -1:.3f}"
        )
        prev = per


if __name__ == "__main__":
    main()
