"""FPN segmentation text detector (judged config #4).

Rebuilds the reference's ``decoders/seg_detector.py`` [U] (SURVEY.md §2.4):
ResNet C2–C5 pyramid -> FPN top-down fusion -> concatenated multi-scale
feature -> per-pixel heads. We produce the DB-style pair (probability map +
threshold map) with differentiable binarization — MegReader's segmentation
detector lineage (its descendant DBNet shares the framework skeleton) — and
train with balanced BCE + dice + masked L1.

TPU-first: NHWC, bilinear resizes via jax.image (XLA fuses them), no
dynamic shapes; all postprocessing lives in ops/ccl.py on device.

Output maps are at input resolution (stride 1), shape (B, H, W).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.registry import register
from ..ops.losses import balanced_bce_loss, dice_loss, masked_l1_loss
from .resnet import resnet_variant


def _tent_matrix(n_out: int, n_in: int) -> np.ndarray:
    """Half-pixel bilinear resampling weights (n_out, n_in) — exactly the
    jax.image.resize('bilinear') formula (src = (o+0.5)·n_in/n_out − 0.5,
    edge-clamped tent), as a dense matrix so resizes run as MXU matmuls."""
    src = np.clip(
        (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5, 0, n_in - 1
    )
    w = np.maximum(0.0, 1.0 - np.abs(src[:, None] - np.arange(n_in)[None, :]))
    return (w / w.sum(axis=1, keepdims=True)).astype(np.float32)


def _resize_to(x, h, w, method="bilinear"):
    B, H, W, C = x.shape
    if method == "bilinear" and h >= H and w >= W and (h, w) != (H, W):
        # (upscale only: jax.image widens the kernel for anti-aliased
        # DOWNscaling, which the plain tent does not reproduce)
        # separable tent matmuls: jax.image.resize's gather-based lowering
        # measured 0.88 ms/iter across the FPN at 640² batch 8 (round-5
        # trace) vs a bandwidth SOL of ~0.15 ms; two einsums ride the MXU
        # instead. Equality-tested vs jax.image.resize at the FPN scales.
        rh = jnp.asarray(_tent_matrix(h, H), x.dtype)
        rw = jnp.asarray(_tent_matrix(w, W), x.dtype)
        t = jnp.einsum("oh,bhwc->bowc", rh, x)
        return jnp.einsum("pw,bowc->bopc", rw, t)
    return jax.image.resize(x, (B, h, w, C), method=method)


# --- fused [2x bilinear upsample -> 3x3 conv] ------------------------------
#
# The head's upsample chain at 640² is layout-bound, not FLOP-bound: the
# full-res intermediates have 64/32/1 channels (fractional MXU/VPU lane
# use) and each resize+conv pair re-reads them from HBM. But the pair is a
# LINEAR op between nonlinearities, so it folds into ONE low-res conv with
# per-output-phase composed kernels: with half-pixel bilinear 2x upsample,
# u[2a] = 0.25 x[a-1] + 0.75 x[a] and u[2a+1] = 0.75 x[a] + 0.25 x[a+1]
# (clamped at edges = replicate padding), a following zero-padded 3x3 conv
# gives z[2i+p] = sum_t A_p[t] x[i+t] with 3-tap composed kernels per
# phase. We run one (3,3,Cin,4*Cout) conv on the replicate-padded low-res
# map, depth-to-space the 4 phases, and recompute the outermost output
# row/col per side exactly (they see the conv's ZERO padding, which the
# replicate-padded composition does not reproduce). Bit-close to
# resize+conv (tested), ~4x fewer HBM round trips.

# a[p, d+1, t+1] = weight of x[i+t] inside u[2i+p+d]
_PHASE_TAPS = np.array(
    [
        # p = 0:  d=-1: .75 x[i-1]+.25 x[i] | d=0: .25 x[i-1]+.75 x[i]
        #         d=+1: .75 x[i]+.25 x[i+1]
        [[0.75, 0.25, 0.0], [0.25, 0.75, 0.0], [0.0, 0.75, 0.25]],
        # p = 1
        [[0.25, 0.75, 0.0], [0.0, 0.75, 0.25], [0.0, 0.25, 0.75]],
    ],
    np.float32,
)


def _edge2_first(x):
    """First two rows of the vertical half-pixel 2x upsample, exactly:
    u[0] = x[0] (clamp), u[1] = 0.75 x[0] + 0.25 x[1]. x: (B, H, W, C)."""
    return jnp.concatenate([x[:, :1], 0.75 * x[:, :1] + 0.25 * x[:, 1:2]], 1)


def _edge2_last(x):
    """Last two rows: u[2H-2] = 0.25 x[H-2] + 0.75 x[H-1], u[2H-1] = x[H-1]."""
    return jnp.concatenate(
        [0.25 * x[:, -2:-1] + 0.75 * x[:, -1:], x[:, -1:]], 1
    )


def _fused_upsample_conv(x, kernel, bias):
    """[2x bilinear upsample -> zero-padded 3x3 conv], fused at low res.

    x (B, H, W, Cin); kernel (3, 3, Cin, Cout); bias (Cout,) or None.
    Returns (B, 2H, 2W, Cout), equal to
    ``conv3x3(zero_pad(resize_to(x, 2H, 2W)))`` (interior composed kernels
    + exact recomputation of the outermost output row/col per side).
    """
    B, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    taps = jnp.asarray(_PHASE_TAPS, kernel.dtype)
    # composed kernels K[p,q,th,tw,ci,co], stacked phase-major into 4*Cout
    K = jnp.einsum("pdh,qew,deio->pqhwio", taps, taps, kernel)
    K = jnp.transpose(K, (2, 3, 4, 0, 1, 5)).reshape(3, 3, Cin, 4 * Cout)

    xr = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    z = jax.lax.conv_general_dilated(
        xr, K, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )  # (B, H, W, 4*Cout)
    z = z.reshape(B, H, W, 2, 2, Cout)
    z = jnp.transpose(z, (0, 1, 3, 2, 4, 5)).reshape(B, 2 * H, 2 * W, Cout)

    # Border fix: the outermost output row/col per side sees the conv's
    # ZERO padding on the upsampled grid (the composed interior kernels
    # see replicate). Recompute those four 1-px strips exactly from thin
    # 2-row strips: z[0] = k[1]·u[0] + k[2]·u[1], z[-1] = k[0]·u[-2] +
    # k[1]·u[-1], and transposed for columns (the column pass is exact in
    # both dims, so it also settles the corners). Round-5 de-serialization:
    # the FULL 3-row kernel on a 2-row strip with (1, 1) vertical padding
    # yields exactly both formulas at once — output row 0 = k[1]u0 + k[2]u1
    # (zero pad above) and row 1 = k[0]u0 + k[1]u1 (zero pad below) — and
    # the first/last strips batch along the batch axis, so ONE conv
    # replaces the previous four.
    def strip_pair_conv(first, last, n, k):
        # first/last (B, 2, M, Cin) -> ((B, 1, n, Cout) top, bottom)
        Bs, r, _, C = first.shape
        strip = jnp.concatenate([first, last], axis=0)
        strip = jax.image.resize(strip, (2 * Bs, r, n, C), method="bilinear")
        out = jax.lax.conv_general_dilated(
            strip, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=strip.dtype,
        )  # (2B, 2, n, Cout)
        return out[:Bs, :1], out[Bs:, 1:]

    top, bot = strip_pair_conv(_edge2_first(x), _edge2_last(x), 2 * W, kernel)
    z = z.at[:, :1].set(top)
    z = z.at[:, -1:].set(bot)

    xt = jnp.transpose(x, (0, 2, 1, 3))  # (B, W, H, C)
    kT = jnp.transpose(kernel, (1, 0, 2, 3))
    left, right = strip_pair_conv(_edge2_first(xt), _edge2_last(xt), 2 * H, kT)
    z = z.at[:, :, :1].set(jnp.transpose(left, (0, 2, 1, 3)))
    z = z.at[:, :, -1:].set(jnp.transpose(right, (0, 2, 1, 3)))

    if bias is not None:
        z = z + bias
    return z


# --- analytic border stencils for the packed tail ---------------------------
#
# The packed interior edge-pads its low-res input, while the reference
# chain's borders see the bilinear CLAMP (u[0]=x[0], u[2H-1]=x[H-1]) plus
# the convs' ZERO padding on the upsampled grid. Both effects are linear,
# so the exact outer packed row/col is a tiny 2-tap stencil of the outer
# two input rows/cols. Per dim, the weight of input row t inside upsampled
# sample u[j] near the top/bottom (rows of the tables below index
# u[-1..2] / u[2H-3..2H]; zero rows are the conv's zero padding):
_UP1_TOP = np.array(
    [[0, 0], [1, 0], [0.75, 0.25], [0.25, 0.75]], np.float32
)
_UP1_BOT = np.array(
    [[0.75, 0.25], [0.25, 0.75], [0, 1], [0, 0]], np.float32
)
# Stage-2 (packed input): borders reach THREE r-rows (r = the 2x grid held
# as packed phases); tables index u2[-1..4] / u2[4H-5..4H], taps = the
# first/last three r-rows:
_UP2_TOP = np.array(
    [
        [0, 0, 0], [1, 0, 0], [0.75, 0.25, 0],
        [0.25, 0.75, 0], [0, 0.75, 0.25], [0, 0.25, 0.75],
    ],
    np.float32,
)
_UP2_BOT = np.array(
    [
        [0.75, 0.25, 0], [0.25, 0.75, 0], [0, 0.75, 0.25],
        [0, 0.25, 0.75], [0, 0, 1], [0, 0, 0],
    ],
    np.float32,
)
# packed (row, phase) slot of r-row t in the 2-row border window
_P2_TOPMAP = ((0, 0), (0, 1), (1, 0))
_P2_BOTMAP = ((0, 1), (1, 0), (1, 1))


def _border_taps(table, phases):
    """BT[p, d, t] = table[p + d, t]: weight of input row t in the u-grid
    sample feeding conv tap d of border output phase p."""
    return np.stack([table[p : p + 3] for p in range(phases)])


# Per-dim scatter constants for the stage-2 packed composition. Every
# composed kernel below is LINEAR in the conv kernel, and the index
# arithmetic (which packed slot each tap lands in) is data-independent —
# so the whole construction folds into one einsum against a small constant,
# instead of hundreds of dynamic-update-slice ops per kernel build.
def _interior_dim_scatter() -> np.ndarray:
    """U[d, s, f, r]: weight of conv tap d inside composed-kernel spatial
    tap s, input phase f, output full-res phase r (interior formula):
    r = 2q + p, (s, f) = divmod(q + t + 1, 2), weight = _PHASE_TAPS[p, d, t]."""
    U = np.zeros((3, 3, 2, 4), np.float32)
    for q in range(2):
        for p in range(2):
            r = 2 * q + p
            for t in range(3):
                s, f = divmod(q + t + 1, 2)
                U[:, s, f, r] += _PHASE_TAPS[p, :, t]
    return U


def _border_dim_scatter(table, pmap) -> np.ndarray:
    """V[d, s, f, r]: same contraction for a BORDER dim — output full-res
    phase r's conv tap d reads r-row t, which packs to (row s, phase f)
    via ``pmap``; weight = the border stencil table."""
    b2 = _border_taps(table, 4)  # (4 out phases, 3 taps, 3 r-rows)
    V = np.zeros((3, 2, 2, 4), np.float32)
    for r in range(4):
        for t in range(3):
            s, f = pmap[t]
            V[:, s, f, r] += b2[r, :, t]
    return V


_U2_INT = _interior_dim_scatter()
_V2_TOP = _border_dim_scatter(_UP2_TOP, _P2_TOPMAP)
_V2_BOT = _border_dim_scatter(_UP2_BOT, _P2_BOTMAP)


def _stage1_borders(x, kernel, bias, v):
    """Overwrite the packed stage-1 tensor's outer packed row/col (and
    corners) with the EXACT values of [2x clamp upsample -> zero-padded
    conv3x3], as analytic stencils over the outer two input rows/cols.
    x (B,H,W,Cin) stage input; v (B,H,W,2,2,Cout) packed interior."""
    B, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    taps = jnp.asarray(_PHASE_TAPS, kernel.dtype)
    bt = jnp.asarray(_border_taps(_UP1_TOP, 2), kernel.dtype)
    bb = jnp.asarray(_border_taps(_UP1_BOT, 2), kernel.dtype)

    def pack(K, th, tw):
        return jnp.transpose(K, (2, 3, 4, 0, 1, 5)).reshape(
            th, tw, Cin, 4 * Cout
        )

    def conv(s, K):
        z = jax.lax.conv_general_dilated(
            s, K, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=s.dtype,
        )
        return z if bias is None else z + jnp.tile(bias, 4)

    padw = lambda s: jnp.pad(s, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    padh = lambda s: jnp.pad(s, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
    Kt = pack(jnp.einsum("pdh,qew,deio->pqhwio", bt, taps, kernel), 2, 3)
    Kb = pack(jnp.einsum("pdh,qew,deio->pqhwio", bb, taps, kernel), 2, 3)
    Kl = pack(jnp.einsum("pdh,qew,deio->pqhwio", taps, bt, kernel), 3, 2)
    Kr = pack(jnp.einsum("pdh,qew,deio->pqhwio", taps, bb, kernel), 3, 2)
    top = conv(padw(x[:, :2]), Kt).reshape(B, 1, W, 2, 2, Cout)
    bot = conv(padw(x[:, -2:]), Kb).reshape(B, 1, W, 2, 2, Cout)
    left = conv(padh(x[:, :, :2]), Kl).reshape(B, H, 1, 2, 2, Cout)
    right = conv(padh(x[:, :, -2:]), Kr).reshape(B, H, 1, 2, 2, Cout)
    # All four corner cells in ONE einsum (stacked corner kernels / patches)
    Rc = jnp.stack([bt, bt, bb, bb])
    Cc = jnp.stack([bt, bb, bt, bb])
    Kc = jnp.einsum("npdh,nqew,deio->npqhwio", Rc, Cc, kernel)
    Xc = jnp.stack(
        [x[:, :2, :2], x[:, :2, -2:], x[:, -2:, :2], x[:, -2:, -2:]]
    )  # (4, B, 2, 2, Cin)
    cr = jnp.einsum("nbhwi,npqhwio->nbpqo", Xc, Kc)
    if bias is not None:
        cr = cr + bias
    cr = cr[:, :, None, None]  # (4, B, 1, 1, 2, 2, Cout)
    # Assemble by CONCATENATION, not dynamic-update-slice: eight DUS on the
    # (B, H, W, 2, 2, C) packed tensor each round-trip ~the whole tensor
    # through HBM; two concats copy it twice total (measured ~0.6 ms saved
    # at 640² batch 8).
    mid = jnp.concatenate(
        [left[:, 1:-1], v[:, 1:-1, 1:-1], right[:, 1:-1]], axis=2
    )
    toprow = jnp.concatenate([cr[0], top[:, :, 1:-1], cr[1]], axis=2)
    botrow = jnp.concatenate([cr[2], bot[:, :, 1:-1], cr[3]], axis=2)
    return jnp.concatenate([toprow, mid, botrow], axis=1)


def _packed2_border_kernels(kernel):
    """Row/col/corner border kernels for the packed stage-2 conv: the
    exact outer packed output px (4 full-res px per side) as stencils over
    the outer two PACKED input rows/cols. Returns dict of conv kernels
    keyed (side) plus corner einsum kernels; all act on the flattened
    (..., 4*C1) packed layout and produce (..., 16*C2) packed outputs."""
    C1, C2 = kernel.shape[2], kernel.shape[3]
    U = jnp.asarray(_U2_INT, kernel.dtype)
    Vt = jnp.asarray(_V2_TOP, kernel.dtype)
    Vb = jnp.asarray(_V2_BOT, kernel.dtype)

    def mk(R, C):
        K = jnp.einsum("dhfr,ewgs,deio->hwfgirso", R, C, kernel)
        return K.reshape(R.shape[1], C.shape[1], 4 * C1, 16 * C2)

    Rs = jnp.stack([Vt, Vt, Vb, Vb])
    Cs = jnp.stack([Vt, Vb, Vt, Vb])
    corners = jnp.einsum("ndhfr,newgs,deio->nhwfgirso", Rs, Cs, kernel)
    return {
        "top": mk(Vt, U),
        "bot": mk(Vb, U),
        "left": mk(U, Vt),
        "right": mk(U, Vb),
        # (4 corners tl/tr/bl/br, 2, 2, 4*C1, 16*C2) for one batched einsum
        "corners": corners.reshape(4, 2, 2, 4 * C1, 16 * C2),
    }


def _packed2_conv_exact(v, kernel, bias):
    """Stage-2 of the packed head tail with EXACT borders: interior via
    the composed packed kernel, outer packed row/col/corners via the
    analytic border stencils — no full-res intermediates, no strip
    recompute. v (B,H,W,2,2,C1) -> (B,4H,4W,C2), equal to
    [2x upsample -> zero-padded conv3x3] on the unpacked 2x-res input."""
    B, H, W, _, _, C1 = v.shape
    C2 = kernel.shape[-1]
    K = _packed2_kernel(kernel)
    vf = v.reshape(B, H, W, 4 * C1)
    vr = jnp.pad(vf, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    z = jax.lax.conv_general_dilated(
        vr, K, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=vf.dtype,
    )  # (B, H, W, 16*C2)
    bk = _packed2_border_kernels(kernel)

    def conv(s, Kb):
        return jax.lax.conv_general_dilated(
            s, Kb, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=s.dtype,
        )

    padw = lambda s: jnp.pad(s, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    padh = lambda s: jnp.pad(s, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
    top = conv(padw(vf[:, :2]), bk["top"])  # (B, 1, W, 16*C2)
    bot = conv(padw(vf[:, -2:]), bk["bot"])
    left = conv(padh(vf[:, :, :2]), bk["left"])  # (B, H, 1, 16*C2)
    right = conv(padh(vf[:, :, -2:]), bk["right"])
    Xc = jnp.stack(
        [vf[:, :2, :2], vf[:, :2, -2:], vf[:, -2:, :2], vf[:, -2:, -2:]]
    )  # (4, B, 2, 2, 4*C1)
    cr = jnp.einsum("nbhwi,nhwio->nbo", Xc, bk["corners"])
    cr = cr[:, :, None, None]  # (4, B, 1, 1, 16*C2)
    # concat assembly (see _stage1_borders): no DUS round trips
    mid = jnp.concatenate(
        [left[:, 1:-1], z[:, 1:-1, 1:-1], right[:, 1:-1]], axis=2
    )
    toprow = jnp.concatenate([cr[0], top[:, :, 1:-1], cr[1]], axis=2)
    botrow = jnp.concatenate([cr[2], bot[:, :, 1:-1], cr[3]], axis=2)
    z = jnp.concatenate([toprow, mid, botrow], axis=1)
    if bias is not None:
        z = z + jnp.tile(bias, 16)
    z = z.reshape(B, H, W, 4, 4, C2)
    z = jnp.transpose(z, (0, 1, 3, 2, 4, 5)).reshape(B, 4 * H, 4 * W, C2)
    return z


def _phase_conv_packed(x, kernel, bias):
    """Stage-1 of the packed head tail: the interior of
    ``_fused_upsample_conv`` WITHOUT depth-to-space — returns phases as
    channels (B, H, W, 2, 2, Cout), row-phase-major. Borders are NOT fixed
    here; the packed head recomputes all outer output strips exactly from
    thin slices at the end (``MapHead``)."""
    B, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    taps = jnp.asarray(_PHASE_TAPS, kernel.dtype)
    K = jnp.einsum("pdh,qew,deio->pqhwio", taps, taps, kernel)
    K = jnp.transpose(K, (2, 3, 4, 0, 1, 5)).reshape(3, 3, Cin, 4 * Cout)
    xr = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    z = jax.lax.conv_general_dilated(
        xr, K, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    if bias is not None:
        z = z + jnp.tile(bias, 4)
    return z.reshape(B, H, W, 2, 2, Cout)


def _packed2_kernel(kernel):
    """Compose [2x bilinear upsample -> 3x3 conv] with a PHASE-PACKED input:
    kernel (3, 3, C1, C2) -> (3, 3, 4*C1, 16*C2) acting on the stage-1
    packed tensor (channels ((ph, pw), C1) row-phase-major) and producing
    ((rh, rw), C2) with r = 2*q + p' — i.e. the second upsample-conv stage
    evaluated directly at LOW resolution. Derivation: per dim,
    z[2i+p'] = sum_t A2[p', t] * u[i+t-1] (the stage-1 composition with
    u = packed stage-1 output on the 2x grid), and u[2a+q+t-1] lands in
    packed slot (a+s, phi) with (s, phi) = divmod(q+t-1+2, 2) - (1, 0)."""
    C1, C2 = kernel.shape[2], kernel.shape[3]
    U = jnp.asarray(_U2_INT, kernel.dtype)
    # one contraction: K[sh,sw,(fh,fw,ci),(rh,rw,co)] = U_h U_w kernel
    K = jnp.einsum("dhfr,ewgs,deio->hwfgirso", U, U, kernel)
    return K.reshape(3, 3, 4 * C1, 16 * C2)


def _packed2_conv(v, kernel, bias):
    """Stage-2 of the packed head tail: v (B, H, W, 2, 2, C1) packed stage-1
    output -> (B, 4H, 4W, C2), the exact interior of
    [2x upsample -> conv3x3] applied to the virtual 2x-resolution image.
    All compute stays at (H, W) with wide channels; ONE final
    depth-to-space(4) produces the full-res map."""
    B, H, W, _, _, C1 = v.shape
    C2 = kernel.shape[-1]
    K = _packed2_kernel(kernel)
    vf = v.reshape(B, H, W, 4 * C1)
    vr = jnp.pad(vf, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    z = jax.lax.conv_general_dilated(
        vr, K, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=vf.dtype,
    )  # (B, H, W, 16*C2)
    if bias is not None:
        z = z + jnp.tile(bias, 16)
    z = z.reshape(B, H, W, 4, 4, C2)
    z = jnp.transpose(z, (0, 1, 3, 2, 4, 5)).reshape(B, 4 * H, 4 * W, C2)
    return z


class FPNNeck(nn.Module):
    """Top-down FPN: laterals to `dim`, upsample+add, smooth, concat at /4."""

    dim: int = 256
    out_dim: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, feats: Tuple[jnp.ndarray, ...]) -> jnp.ndarray:
        c2, c3, c4, c5 = feats
        dt = self.dtype
        p5 = nn.Conv(self.dim, (1, 1), dtype=dt, name="lat5")(c5)
        p4 = nn.Conv(self.dim, (1, 1), dtype=dt, name="lat4")(c4) + _resize_to(
            p5, c4.shape[1], c4.shape[2]
        )
        p3 = nn.Conv(self.dim, (1, 1), dtype=dt, name="lat3")(c3) + _resize_to(
            p4, c3.shape[1], c3.shape[2]
        )
        p2 = nn.Conv(self.dim, (1, 1), dtype=dt, name="lat2")(c2) + _resize_to(
            p3, c2.shape[1], c2.shape[2]
        )
        q = self.out_dim // 4
        h, w = c2.shape[1], c2.shape[2]
        outs = []
        for i, p in enumerate([p2, p3, p4, p5]):
            s = nn.Conv(q, (3, 3), padding=((1, 1), (1, 1)), dtype=dt, name=f"smooth{i + 2}")(p)
            outs.append(_resize_to(s, h, w))
        return jnp.concatenate(outs, axis=-1)  # (B, H/4, W/4, out_dim)


class _UpConv(nn.Module):
    """Drop-in for [2x bilinear upsample -> nn.Conv 3x3]: identical param
    tree (kernel/bias, same shapes/inits as nn.Conv) and identical output
    (`_fused_upsample_conv` is the exact composition), one low-res conv."""

    features: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mode: str = "full"):
        """``mode``: 'full' = exact (B, 2H, 2W, C) output incl. border fix;
        'packed' = stage-1 interior, phases-as-channels (B, H, W, 2, 2, C);
        'packed2' = stage-2 on a packed input (B, H, W, 2, 2, Cin) ->
        (B, 4H, 4W, C); 'naive' = literal resize->zero-padded-conv (the
        reference formulation, no fusion) — cheapest op count on THIN
        strips, used by the packed head's border recompute. Packed modes
        keep all compute at low resolution with wide channels (the
        full-res 32/1-channel intermediates are layout-bound on TPU);
        their borders are recomputed by the caller."""
        Cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, Cin, self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        if self.dtype is not None:
            dt = self.dtype
        else:  # flax nn.Conv promotion semantics (dtype=None)
            dt = jnp.promote_types(x.dtype, kernel.dtype)
        x = x.astype(dt)
        kernel = kernel.astype(dt)
        bias = bias.astype(dt) if bias is not None else None
        if mode == "packed":
            return _phase_conv_packed(x, kernel, bias)
        if mode == "packed_exact":
            v = _phase_conv_packed(x, kernel, bias)
            return _stage1_borders(x, kernel, bias, v)
        if mode == "packed2":
            return _packed2_conv(x, kernel, bias)
        if mode == "packed2_exact":
            return _packed2_conv_exact(x, kernel, bias)
        if mode == "naive":
            B, H, W, _ = x.shape
            t = _resize_to(x, 2 * H, 2 * W)
            z = jax.lax.conv_general_dilated(
                t, kernel, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=t.dtype,
            )
            return z if bias is None else z + bias
        return _fused_upsample_conv(x, kernel, bias)


class MapHead(nn.Module):
    """conv3x3 -> BN -> relu -> 2× upsample-conv -> 1-channel sigmoid map.

    ``fused_upsample=True`` (default) folds each [2x bilinear upsample ->
    3x3 conv] pair into one low-res phase conv (same params, same output;
    the full-res formulation's 64/32/1-channel intermediates are
    layout-bound on TPU — measured 14.9 -> ~4 ms per head at 640² batch 8).
    """

    dim: int = 64
    dtype: Any = None
    fused_upsample: bool = True
    #: serving-only: evaluate the WHOLE upsample tail at low resolution with
    #: phases packed as channels (64 -> 128 -> 16 wide at H/4), one final
    #: depth-to-space(4) — nothing materializes at 2x/4x except the map.
    #: Exact: outer 4-px strips recomputed through the reference chain.
    packed_serving: bool = True
    #: border handling for the packed tail: True = analytic 2-/3-tap border
    #: stencils (closed-form composition of [clamp upsample -> zero-pad
    #: conv] at the edges; no full-res strip recompute at all), False = the
    #: round-4 strip recompute (two batched tail_full calls on thin
    #: slices). Both are exact vs the reference formulation (tested).
    analytic_borders: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        y = nn.Conv(self.dim, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, dtype=dt, name="conv")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="bn")(y)
        y = nn.relu(y)
        # BN computes fp32; the convs continue in the compute dtype (mixed
        # precision) or the head's input dtype (fully-cast serving trees) —
        # otherwise fp32 leaks into the full-res tail
        y = y.astype(dt if dt is not None else x.dtype)
        B, h, w, _ = y.shape
        if not self.fused_upsample:
            y = _resize_to(y, h * 2, w * 2)
            y = nn.Conv(self.dim // 2, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, dtype=dt, name="up1")(y)
            y = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="bn1")(y)
            y = nn.relu(y)
            y = y.astype(dt if dt is not None else x.dtype)
            y = _resize_to(y, h * 4, w * 4)
            y = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), dtype=dt, name="up2")(y)
            return jax.nn.sigmoid(y[..., 0].astype(jnp.float32))

        up1 = _UpConv(self.dim // 2, use_bias=False, dtype=dt, name="up1")
        bn1 = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="bn1")
        up2 = _UpConv(1, dtype=dt, name="up2")
        cdt = dt if dt is not None else x.dtype

        def tail_full(y0):
            t = up1(y0)
            t = nn.relu(bn1(t)).astype(cdt)
            return up2(t)

        # Training keeps the 2x-resolution intermediate: BN batch statistics
        # must be computed over the SAME tensor the reference formulation
        # normalizes (per-phase packing reweights nothing, but keeping one
        # canonical stats path avoids two updaters for one variable).
        if train or not self.packed_serving:
            y = tail_full(y)
            return jax.nn.sigmoid(y[..., 0].astype(jnp.float32))

        # --- packed serving tail: everything at (h, w) until one d2s(4) ---
        if self.analytic_borders:
            # Exact borders by construction: stage-1 overwrites its outer
            # packed row/col with the closed-form [clamp-upsample ->
            # zero-pad-conv] stencils, stage-2 routes its outer packed
            # row/col through analytic border kernels. No full-res strip
            # recompute, no 2x/4x intermediates anywhere.
            v = up1(y, mode="packed_exact")  # (B, h, w, 2, 2, dim/2)
            v = nn.relu(bn1(v)).astype(cdt)
            z = up2(v, mode="packed2_exact")  # (B, 4h, 4w, 1)
            return jax.nn.sigmoid(z[..., 0].astype(jnp.float32))

        v = up1(y, mode="packed")  # (B, h, w, 2, 2, dim/2)
        v = nn.relu(bn1(v)).astype(cdt)  # eval BN = per-channel affine
        z = up2(v, mode="packed2")  # (B, 4h, 4w, 1)

        # Exact border recompute: the packed interior edge-pads where the
        # reference chain sees the bilinear clamp AND the convs' zero pad.
        # Outer 4-px output strips re-run the reference path on thin
        # slices (8 guard rows/cols cover the tail's receptive field).
        # Columns run AFTER rows from full-height slices, settling corners.
        # Opposite sides batch along the batch axis (round-5: the border
        # machinery serialized ~1 ms of small convs; two tail_full calls
        # instead of four, each conv inside them already pair-batched).
        # Measured negative (round-5b, scripts/profile_packed_head.py):
        # running the strips through the NAIVE resize->conv tail instead
        # of tail_full — fewer ops on paper — was SLOWER (head 3.3 vs
        # 2.85 ms at 640² batch 8): the full-res thin-strip intermediates'
        # layouts cost more than the fused path's extra small ops.
        B = y.shape[0]
        g, k = 8, 4
        tb = tail_full(jnp.concatenate([y[:, :g], y[:, -g:]], axis=0))
        z = z.at[:, :k].set(tb[:B, :k])
        z = z.at[:, -k:].set(tb[B:, -k:])
        lr = tail_full(jnp.concatenate([y[:, :, :g], y[:, :, -g:]], axis=0))
        z = z.at[:, :, :k].set(lr[:B, :, :k])
        z = z.at[:, :, -k:].set(lr[B:, :, -k:])
        return jax.nn.sigmoid(z[..., 0].astype(jnp.float32))


class SegDetectorNet(nn.Module):
    num_backbone: str = "resnet18"
    fpn_dim: int = 256
    head_dim: int = 64
    k: float = 50.0  # differentiable-binarization steepness
    width: int = 64  # trunk base width
    #: 1-based trunk stages whose 3x3 convs are deformable (DCNv2) — the
    #: reference's deformable-ResNet detectors use (3, 4) or (2, 3, 4)
    #: (SURVEY.md §2.3/§2.6 N1).
    dcn_stages: Tuple[int, ...] = ()
    #: conv compute dtype (bf16 = mixed-precision training; maps/loss fp32)
    dtype: Any = None
    fused_upsample: bool = True
    #: exact space-to-depth stem rewrite (see models/resnet.py) — same
    #: params/checkpoints, better MXU packing of the 3-channel input
    stem_s2d: bool = False
    #: 4x4 space-to-depth stem THROUGH the maxpool (round-5 profile-guided
    #: rewrite; see models/resnet.py) — same params/checkpoints
    stem_s2d4: bool = False

    @nn.compact
    def __call__(
        self, images, train: bool = False, heads: Tuple[str, ...] = ("prob", "thresh")
    ) -> Dict[str, jnp.ndarray]:
        """``heads`` selects which map heads to run. The DB threshold map is
        a TRAINING auxiliary (the adaptive-binarization target); serving
        binarizes the prob map at a fixed threshold, so inference callers
        pass ``heads=('prob',)`` and skip the whole thresh-head tail —
        nearly half the full-res head compute. Unused head params are
        simply not touched (flax ignores unvisited variables at apply)."""
        feats = resnet_variant(
            self.num_backbone, "det", width=self.width, dtype=self.dtype,
            dcn_stages=tuple(self.dcn_stages), stem_s2d=self.stem_s2d,
            stem_s2d4=self.stem_s2d4,
        )(images, train=train)
        fused = FPNNeck(self.fpn_dim, self.fpn_dim, dtype=self.dtype, name="fpn")(feats)
        out: Dict[str, jnp.ndarray] = {}
        if "prob" in heads:
            out["prob"] = MapHead(
                self.head_dim, dtype=self.dtype,
                fused_upsample=self.fused_upsample, name="prob_head",
            )(fused, train=train)
        if "thresh" in heads:
            out["thresh"] = MapHead(
                self.head_dim, dtype=self.dtype,
                fused_upsample=self.fused_upsample, name="thresh_head",
            )(fused, train=train)
        if "prob" in heads and "thresh" in heads:
            out["binary"] = jax.nn.sigmoid(self.k * (out["prob"] - out["thresh"]))
        return out


@register
class SegDetector:
    """Task wrapper: loss over prob/thresh/binary maps, map inference."""

    def __init__(
        self,
        backbone: str = "resnet18",
        fpn_dim: int = 256,
        head_dim: int = 64,
        k: float = 50.0,
        bce_scale: float = 5.0,
        l1_scale: float = 10.0,
        negative_ratio: float = 3.0,
        width: int = 64,
        compute_dtype: str = "float32",  # 'float32' | 'bfloat16'
        fused_upsample: bool = True,
        dcn_stages=(),  # e.g. (3, 4): deformable 3x3 convs in those stages
        stem_s2d: bool = False,
        stem_s2d4: bool = False,  # default pending TPU measurement
    ):
        self.net = SegDetectorNet(
            backbone, fpn_dim, head_dim, k, width,
            dcn_stages=tuple(dcn_stages),
            dtype=jnp.bfloat16 if compute_dtype == "bfloat16" else None,
            fused_upsample=fused_upsample,
            stem_s2d=stem_s2d,
            stem_s2d4=stem_s2d4,
        )
        self.bce_scale = bce_scale
        self.l1_scale = l1_scale
        self.negative_ratio = negative_ratio

    def init(self, rng, sample_images):
        return self.net.init(rng, sample_images, train=False)

    def apply(
        self, variables, images, train: bool = False, mutable=False,
        heads=("prob", "thresh"),
    ):
        return self.net.apply(
            variables, images, train=train, mutable=mutable, heads=tuple(heads)
        )

    def loss(self, variables, batch, train: bool = True, rngs=None):
        """batch keys (all (B,H,W) float32 unless noted):
        image (B,H,W,3); gt: shrunk text mask; mask: valid-region mask
        (ignores excluded); thresh_map, thresh_mask: threshold-map target
        and its support (text-border band).
        """
        out = self.net.apply(
            variables,
            batch["image"],
            train=train,
            mutable=["batch_stats"] if train else False,
            rngs=rngs,
        )
        maps, new_state = out if train else (out, {})
        bce = balanced_bce_loss(
            maps["prob"], batch["gt"], batch["mask"], self.negative_ratio
        )
        dice = dice_loss(maps["binary"], batch["gt"], batch["mask"])
        l1 = masked_l1_loss(maps["thresh"], batch["thresh_map"], batch["thresh_mask"])
        total = self.bce_scale * bce + dice + self.l1_scale * l1
        metrics = {"loss": total, "bce": bce, "dice": dice, "thresh_l1": l1}
        return total, (metrics, new_state)

    def predict_maps(self, variables, images):
        return self.net.apply(variables, images, train=False)
