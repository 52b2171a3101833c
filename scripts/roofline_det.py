#!/usr/bin/env python
"""Analytic roofline for the serving detector (VERDICT r4 task #4).

The question: is det_fwd_ms ~= 9 ms at 640^2/batch-8 leaving real speed
on the table (trunk MFU 0.275), or is that near the v5e bound for these
shapes? This script answers it WITHOUT the TPU: it traces the actual
model under ``jax.eval_shape`` with a Flax method interceptor, records
every conv's true shapes, and computes two speed-of-light estimates per
stage group:

- **ideal**: max(FLOPs / 197 TFLOP/s, min-bytes / 819 GB/s) — min-bytes
  assumes perfect fusion (every activation written once, read once per
  consumer; BN/ReLU/residual-add free).
- **pad-aware**: same, but conv-as-GEMM contraction (k^2*Cin/groups) and
  output-channel dims rounded up to the 128-lane MXU tile — the FLOPs
  the systolic array actually clocks through for skinny channel dims.

The gap between measured time and the ideal SOL is the XLA/fusion/layout
overhead; the gap between ideal and pad-aware is *architectural* — no
scheduling can recover it at these channel widths (stem k^2*Cin = 147
pads to 256; C=64 stages pad to 128).

v5e peaks: 197 TFLOP/s bf16 (bench.py PEAK_BF16_FLOPS), 819 GB/s HBM.

Usage: roofline_det.py [--hw 640] [--batch 8] [--backbone resnet18]
       [--measured trunk_ms,fpn_ms,head_ms]   # from profile_det.py
"""

import argparse
import sys
from collections import defaultdict

sys.path.insert(0, __file__.rsplit("/", 2)[0])

PEAK = 197e12  # bf16 FLOP/s
BW = 819e9     # HBM bytes/s
BYTES = 2      # bf16


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=640)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--backbone", default="resnet18")
    ap.add_argument("--measured", default="4.3,1.5,3.2",
                    help="trunk,fpn,head ms from profile_det.py (r4/r5 runs)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import flax.linen as nn
    import jax.numpy as jnp

    from megreader_tpu.models.detector import SegDetector

    B, H, W = args.batch, args.hw, args.hw
    det = SegDetector(backbone=args.backbone)
    x = jax.ShapeDtypeStruct((B, H, W, 3), jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    det_vars = jax.eval_shape(det.net.init, rng, jax.ShapeDtypeStruct((1, H, W, 3), jnp.float32))

    convs = []  # (path, M, K, N, bytes) — conv-as-GEMM dims + min HBM traffic

    def _np(shape):
        p = 1
        for s in shape:
            p *= int(s)
        return p

    def interceptor(next_fun, fargs, fkwargs, context):
        out = next_fun(*fargs, **fkwargs)
        mod = context.module
        if context.method_name != "__call__" or type(mod).__name__ not in (
            "Conv", "_UpConv"
        ):
            return out
        path = "/".join(mod.path)
        ish, osh = tuple(fargs[0].shape), tuple(out.shape)
        if type(mod) is nn.Conv:
            k2 = 1
            for kk in tuple(mod.kernel_size):
                k2 *= kk
            g = mod.feature_group_count
            M = _np(osh[:-1])
            K, N = k2 * ish[-1] // g, osh[-1]
            nbytes = BYTES * (_np(ish) + _np(osh) + K * N * g)
            convs.append((path, M, K, N, nbytes))
        elif type(mod).__name__ == "_UpConv":
            # packed head stages run raw lax.conv on composed kernels:
            # full/packed = 3x3 Cin -> 4*Cout at (h, w); packed2 = 3x3
            # 4*Cin' -> 16*Cout at (h, w) (detector.py _phase_conv_packed /
            # _packed2_conv). Border strips re-enter here in 'full' mode.
            mode = fargs[1] if len(fargs) > 1 else fkwargs.get("mode", "full")
            B_, h_, w_ = ish[0], ish[1], ish[2]
            M = B_ * h_ * w_
            if mode == "packed2":
                cin = 4 * ish[-1]
                K, N = 9 * cin, 16 * mod.features
            else:
                K, N = 9 * ish[-1], 4 * mod.features
            nbytes = BYTES * (_np(ish) + _np(osh) + K * N)
            convs.append((path + f"[{mode}]", M, K, N, nbytes))
        return out

    def fwd(v, xx):
        with nn.intercept_methods(interceptor):
            return det.net.apply(v, xx, train=False, heads=("prob",))

    jax.eval_shape(fwd, det_vars, x)

    def group_of(path: str) -> str:
        if path.startswith("ResNet_0"):
            parts = path.split("/")
            for p in parts:
                if p.startswith("layer"):
                    return "trunk." + p.split("_")[0]
            return "trunk.stem"
        if path.startswith("fpn"):
            return "fpn"
        return "head"

    rows = defaultdict(lambda: [0.0, 0.0, 0.0, 0])  # flops, pad_flops, bytes, n
    for path, m, K, cout, nbytes in convs:
        fl = 2.0 * m * K * cout
        fl_pad = 2.0 * m * _ceil_to(K, 128) * _ceil_to(cout, 128)
        grp = group_of(path)
        rows[grp][0] += fl
        rows[grp][1] += fl_pad
        rows[grp][2] += nbytes
        rows[grp][3] += 1

    # FPN/head bilinear resizes move real bytes with zero MXU FLOPs; add
    # their traffic (read in + write out) per _resize_to call site: FPN
    # top-down 3 (20->40->80->160 at fpn_dim/…) + 3 rescale-to-p2, head
    # fused-upsample stays at stride 4 (packed) so no extra.
    fpn_dim = det.net.fpn_dim
    h4 = H // 4
    resize_bytes = 0.0
    for s in (H // 16, H // 8, H // 4):  # top-down sums write at s
        resize_bytes += BYTES * B * (s * s + (s // 2) ** 2) * fpn_dim
    for s in (H // 32, H // 16, H // 8):  # rescale each scale to p2
        resize_bytes += BYTES * B * (s * s + h4 * h4) * (fpn_dim // 4)
    rows["fpn"][2] += resize_bytes

    order = ["trunk.stem", "trunk.layer1", "trunk.layer2", "trunk.layer3",
             "trunk.layer4", "fpn", "head"]
    meas = dict(zip(["trunk", "fpn", "head"],
                    (float(v) for v in args.measured.split(","))))

    print(f"# detector roofline @ {H}x{W} batch={B} {args.backbone} bf16 "
          f"(v5e: {PEAK/1e12:.0f} TFLOP/s, {BW/1e9:.0f} GB/s)\n")
    print("| group | convs | GFLOP | GFLOP(pad128) | MB(min) | AI | "
          "SOL ms | SOL ms(pad) | bound |")
    print("|---|---|---|---|---|---|---|---|---|")
    tot = [0.0, 0.0, 0.0]
    grp_sol = defaultdict(float)
    for gname in order:
        fl, flp, by, n = rows[gname]
        t_c, t_cp, t_b = fl / PEAK, flp / PEAK, by / BW
        sol, solp = max(t_c, t_b), max(t_cp, t_b)
        bound = "HBM" if t_b >= t_cp else "MXU"
        ai = fl / by if by else 0.0
        print(f"| {gname} | {n} | {fl/1e9:.1f} | {flp/1e9:.1f} | "
              f"{by/1e6:.1f} | {ai:.0f} | {sol*1e3:.2f} | {solp*1e3:.2f} "
              f"| {bound} |")
        tot[0] += fl
        tot[1] += flp
        tot[2] += by
        grp_sol[gname.split(".")[0]] += solp
    sol = max(tot[0] / PEAK, tot[2] / BW)
    solp = max(tot[1] / PEAK, tot[2] / BW)
    print(f"| **total** |  | {tot[0]/1e9:.1f} | {tot[1]/1e9:.1f} | "
          f"{tot[2]/1e6:.1f} | {tot[0]/tot[2]:.0f} | {sol*1e3:.2f} | "
          f"{solp*1e3:.2f} |  |")

    print("\n| section | SOL(pad, per-group sum) ms | measured ms | "
          "achieved vs pad-SOL |")
    print("|---|---|---|---|")
    for sec in ("trunk", "fpn", "head"):
        s = grp_sol[sec]
        m = meas.get(sec)
        print(f"| {sec} | {s*1e3:.2f} | {m:.1f} | {s*1e3/m*100:.0f}% |")
    s_all = sum(grp_sol.values())
    m_all = sum(meas.values())
    print(f"| total | {s_all*1e3:.2f} | {m_all:.1f} | "
          f"{s_all*1e3/m_all*100:.0f}% |")
    print("\nnotes: min-bytes assumes every activation is written once and "
          "read once per consumer (BN/ReLU/add fused, no rematerialization); "
          "pad128 rounds conv-as-GEMM contraction (k^2*Cin) and Cout up to "
          "the 128-lane MXU tile. Per-group SOL sums assume no cross-stage "
          "overlap (stages are data-dependent).")


if __name__ == "__main__":
    main()
