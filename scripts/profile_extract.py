#!/usr/bin/env python
"""Micro-profile of extract_regions internals on real detector masks.

Times progressively larger prefixes of _region_stats_single so each
phase's marginal cost is visible:

  density:   integral-image candidate density + top_k(K2) roots
  cand_area: + (K2, N) comparison masks -> exact candidate areas
  moments:   + top-K by area + (K, N) mask + (K,N)x(N,6) moment matmul
  extents:   + rotated projections u/v + masked min/max  (the full op)
"""

import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench as _bench
    from megreader_tpu.data import SyntheticDetectionDataset
    from megreader_tpu.models.detector import SegDetector
    from megreader_tpu.ops.ccl import connected_components
    from megreader_tpu.ops.image import normalize
    from megreader_tpu.ops.precision import cast_floats

    jax.config.update("jax_compilation_cache_dir", "/root/repo/runs/jax_cache")
    B = 8
    H = W = int(sys.argv[1]) if len(sys.argv) > 1 else 640
    K = 32
    det = SegDetector()
    det_vars = det.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    det_vars, _ = _bench._ensure_trained_detector(det, det_vars)
    det_vars = cast_floats(det_vars, jnp.bfloat16)
    ds = SyntheticDetectionDataset(n=B, hw=(H, W), seed=900, gt_maps=False)
    pages = jnp.asarray(np.stack([ds[i]["image"] for i in range(B)]).astype(np.float32))

    @jax.jit
    def to_labels(pages):
        x = normalize(pages).astype(jnp.bfloat16)
        prob = det.net.apply(det_vars, x, train=False)["prob"].astype(jnp.float32)
        return connected_components(prob > 0.3, max_iters=24), prob

    labels, prob = jax.block_until_ready(to_labels(pages))
    labels = jnp.asarray(np.asarray(labels))  # sever from the det graph
    prob = jnp.asarray(np.asarray(prob))

    def phase(stop):
        def single(args):
            lbl, sc = args
            N = H * W
            flat_lbl = lbl.reshape(-1)
            valid = flat_lbl >= 0
            one = valid.astype(jnp.float32)
            K2 = max(4 * K, 64)
            idx = (
                jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
                + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
            ).reshape(-1)
            is_root = (flat_lbl == idx) & valid
            R = 15
            ii = jnp.cumsum(jnp.cumsum(one.reshape(H, W), axis=0), axis=1)
            ii = jnp.pad(ii, ((1, 0), (1, 0)))
            iipad = jnp.pad(ii, ((R, R + 1), (R, R + 1)), mode="edge")

            def corner(dy, dx):
                return jax.lax.dynamic_slice(iipad, (R + dy, R + dx), (H, W))

            density = (
                corner(R + 1, R + 1) - corner(-R, R + 1) - corner(R + 1, -R)
                + corner(-R, -R)
            ).reshape(-1)
            root_score = jnp.where(is_root, density + 1.0, 0.0)
            cand_score, cand_idx = jax.lax.top_k(root_score, K2)
            cand_alive = cand_score > 0.0
            if stop == "density":
                return jnp.sum(cand_idx).astype(jnp.float32)
            mask_c = (flat_lbl[None, :] == cand_idx[:, None]) & valid[None, :]
            cand_area = jnp.sum(mask_c, axis=1).astype(jnp.float32) * cand_alive
            if stop == "cand_area":
                return jnp.sum(cand_area)
            top_area, sel = jax.lax.top_k(cand_area, K)
            top_root = jnp.take(cand_idx, sel)
            mask = (flat_lbl[None, :] == top_root[:, None]) & valid[None, :]
            mask_f = mask.astype(jnp.float32)
            ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).reshape(-1).astype(jnp.float32)
            xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).reshape(-1).astype(jnp.float32)
            sc_f = sc.reshape(-1)
            feats = jnp.stack([sc_f, xs, ys, xs * xs, ys * ys, xs * ys], axis=1)
            M = jnp.dot(mask_f, feats, preferred_element_type=jnp.float32)
            if stop == "moments":
                return jnp.sum(M)
            a = jnp.maximum(top_area, 1.0)
            cx = M[:, 1] / a
            cy = M[:, 2] / a
            vxx = M[:, 3] / a - cx * cx
            vyy = M[:, 4] / a - cy * cy
            vxy = M[:, 5] / a - cx * cy
            theta = 0.5 * jnp.arctan2(2.0 * vxy, vxx - vyy)
            cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
            dx = xs[None, :] - cx[:, None]
            dy = ys[None, :] - cy[:, None]
            u = dx * cos_t[:, None] + dy * sin_t[:, None]
            v = -dx * sin_t[:, None] + dy * cos_t[:, None]
            big = jnp.float32(1e9)
            u0 = jnp.min(jnp.where(mask, u, big), axis=1)
            u1 = jnp.max(jnp.where(mask, u, -big), axis=1)
            v0 = jnp.min(jnp.where(mask, v, big), axis=1)
            v1 = jnp.max(jnp.where(mask, v, -big), axis=1)
            return jnp.sum(u0 + u1 + v0 + v1)

        def batched(labels, prob, it):
            out = jax.lax.map(single, (labels + it, prob))  # it==0 at runtime, opaque to XLA
            return jnp.sum(out)

        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(labels, prob, iters):
            def body(carry, _):
                return batched(labels, prob, carry.astype(jnp.int32)) * 1e-20, None

            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return out

        def timed(iters):
            t0 = time.perf_counter()
            float(loop(labels, prob, iters))
            return time.perf_counter() - t0

        return _bench._slope_time(timed, 2, 10)

    prev = 0.0
    print(f"# extract_regions phases, {H}x{W} batch {B} K={K}")
    for stop in ("density", "cand_area", "moments", "extents"):
        t = phase(stop) * 1e3
        print(f"{stop:12s} {t:7.2f} ms/batch (marginal {t - prev:+6.2f})")
        prev = t


if __name__ == "__main__":
    main()
