#!/usr/bin/env python
"""Device-op attribution for the serving detector via jax.profiler trace.

The roofline (scripts/roofline_det.py) prices the detector at 3.9 ms
pad-aware SOL vs 9.0 measured and attributes the gap to XLA scheduling,
not arithmetic. This script gets the ground truth: run the REAL serving
forward under jax.profiler.trace and aggregate the TPU-side op durations
from the perfetto trace json, grouped by fusion/op name — so the next
optimization is aimed at the top measured offender instead of intuition
(stem_s2d, the one intuition-led attempt, measured slower).

Usage: profile_det_trace.py [--hw 640] [--batch 8] [--iters 30] [--top 25]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=640)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--logdir", default="/tmp/det_trace")
    ap.add_argument("--s2d4", action="store_true",
                    help="4x4 space-to-depth stem (same checkpoints)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/runs/jax_cache")

    from megreader_tpu.models.detector import SegDetector
    from megreader_tpu.ops.image import normalize
    from megreader_tpu.ops.precision import cast_floats

    B, H, W = args.batch, args.hw, args.hw
    det = SegDetector(backbone="resnet18", stem_s2d4=args.s2d4)
    det_vars = cast_floats(
        det.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3))), jnp.bfloat16
    )

    @jax.jit
    def fwd(v, pages):
        x = normalize(pages).astype(jnp.bfloat16)
        return det.net.apply(v, x, train=False, heads=("prob",))["prob"]

    pages = jnp.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3)) * 255.0
    )
    fwd(det_vars, pages).block_until_ready()  # compile outside the trace

    os.makedirs(args.logdir, exist_ok=True)
    with jax.profiler.trace(args.logdir):
        for _ in range(args.iters):
            out = fwd(det_vars, pages)
        out.block_until_ready()

    # newest perfetto trace json under the log dir
    paths = sorted(
        glob.glob(
            os.path.join(args.logdir, "plugins/profile/*/*.trace.json.gz")
        ),
        key=os.path.getmtime,
    )
    if not paths:
        print("no trace json found under", args.logdir)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)

    # device-side events live on TPU pids; host threads carry python/runtime
    # names. Identify device pids by process_name metadata.
    pid_name = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_name[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {
        p for p, n in pid_name.items() if "TPU" in n or "/device" in n.lower()
    }

    tot_by_op = collections.Counter()
    cnt_by_op = collections.Counter()
    total = 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "?")
        if name.startswith(("TpuExecute", "RunExecutable")):
            continue  # envelope events double-count their children
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        tot_by_op[name] += dur
        cnt_by_op[name] += 1
        total += dur

    per_iter = total / max(args.iters, 1)
    print(f"device total {total:.2f} ms over {args.iters} iters "
          f"-> {per_iter:.3f} ms/iter  (pids: "
          f"{sorted(pid_name[p] for p in dev_pids)})")
    print(f"{'ms/iter':>9}  {'%':>5}  {'n':>4}  op")
    for name, ms in tot_by_op.most_common(args.top):
        print(f"{ms / args.iters:9.3f}  {100 * ms / max(total, 1e-9):5.1f}"
              f"  {cnt_by_op[name]:4d}  {name[:140]}")


if __name__ == "__main__":
    main()
