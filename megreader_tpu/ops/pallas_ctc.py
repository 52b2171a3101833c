"""Pallas TPU kernels for CTC loss forward/backward.

The TPU-native replacement for cuDNN's CTC kernels (SURVEY.md §2.6 N2).
Structure chosen for the hardware, not translated from CUDA:

* The class->extended-state emission gather (log_probs[b, t, ext[b, s]])
  is hostile to the TPU (per-lane gather). It is instead computed OUTSIDE
  the kernel as a one-hot matmul on the MXU:
      emit[b, t, s] = sum_c onehot(ext)[b, s, c] * logp[b, t, c]
  and the gradient scatters back through the same matmul transposed.
* The sequential DP runs in ONE Pallas kernel per direction: alpha (and
  beta in the backward kernel) lives in VMEM scratch for all T steps — no
  per-step HBM round-trips (an XLA scan materializes its carry every step).
  State-axis shifts s-1 / s-2 are lane rolls (pltpu.roll) + masks.
* Everything is padded to lane width 128 on the state axis (S = 2L+1) and
  kept in f32 (log-space DP).
* The pair is wrapped in jax.custom_vjp: backward computes the exact
  alpha-beta posterior gamma and returns d(nll)/d(emit) = -exp(gamma - logZ).

The public entry ``ctc_loss_pallas`` matches ``ops.ctc.ctc_loss`` semantics
bit-for-... well, to fp32 round-off; tests enforce agreement with the XLA
path and the torch oracle.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ctc import NEG_INF, _extend_labels

LANES = 128
B_TILE = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _logsumexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    safe_m = jnp.maximum(m, NEG_INF)  # avoid -inf - -inf
    out = safe_m + jnp.log(
        jnp.exp(a - safe_m) + jnp.exp(b - safe_m) + jnp.exp(c - safe_m)
    )
    return jnp.where(m <= NEG_INF / 2, NEG_INF, out)


def _shift_right(x, k):
    """Shift along the last (lane) axis by +k, filling with NEG_INF."""
    S = x.shape[-1]
    rolled = pltpu.roll(x, k, axis=len(x.shape) - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    return jnp.where(lane < k, NEG_INF, rolled)


def _shift_left(x, k):
    S = x.shape[-1]
    rolled = pltpu.roll(x, S - k, axis=len(x.shape) - 1)  # roll accepts k>=0 only
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    return jnp.where(lane >= S - k, NEG_INF, rolled)


def _ctc_alpha_kernel(lens_ref, emit_ref, skip_ref, smask_ref, alpha_ref):
    """Forward DP. Shapes per tile: emit (Bt, T, S); skip/smask (Bt, S);
    lens (Bt,) int32 (scalar-prefetch); alpha out (Bt, T, S)."""
    T = emit_ref.shape[1]
    skip = skip_ref[:]   # 0.0 where s-2 transition allowed, NEG_INF else
    smask = smask_ref[:]  # 0.0 for states s < 2L+1, NEG_INF beyond
    lane = jax.lax.broadcasted_iota(jnp.int32, skip.shape, 1)
    init_mask = jnp.where(lane <= 1, 0.0, NEG_INF)

    alpha = emit_ref[:, 0, :] + init_mask + smask
    alpha_ref[:, 0, :] = alpha

    lens = lens_ref[:, 0]  # (Bt,) int32

    def body(t, alpha):
        a1 = _shift_right(alpha, 1)
        a2 = _shift_right(alpha, 2) + skip
        new = _logsumexp3(alpha, a1, a2) + emit_ref[:, t, :] + smask
        active = (t < lens)[:, None]
        alpha = jnp.where(active, new, alpha)
        alpha_ref[:, t, :] = alpha
        return alpha

    jax.lax.fori_loop(1, T, body, alpha)


def _ctc_beta_kernel(
    lens_ref, emit_ref, skip_ref, smask_ref, term_ref, alpha_ref, logz_ref,
    grad_ref,
):
    """Backward DP + gradient. term (Bt, S): 0.0 at terminal states (2L,
    2L-1), NEG_INF else; logz (Bt,): log-likelihood (=-nll); grad out
    (Bt, T, S) = d nll / d emit."""
    T = emit_ref.shape[1]
    skip = skip_ref[:]
    smask = smask_ref[:]
    term = term_ref[:]
    lens = lens_ref[:, 0]
    logz = logz_ref[:, 0]

    # beta[T-1 (effective: len-1), s] = term; for padded t >= len it stays term.
    beta = term

    # grad at the last effective step
    def emit_grad(t, beta):
        gamma = alpha_ref[:, t, :] + beta
        g = -jnp.exp(gamma - logz[:, None])
        g = jnp.where((t < lens)[:, None], g, 0.0)
        grad_ref[:, t, :] = g

    emit_grad(T - 1, beta)

    def body(i, beta):
        t = T - 2 - i
        nxt = beta + emit_ref[:, t + 1, :] + smask
        b1 = _shift_left(nxt, 1)
        # skip transition s -> s+2 allowed iff skip mask at destination s+2
        b2 = _shift_left(nxt + skip, 2)
        new = _logsumexp3(nxt, b1, b2)
        # freeze: for t >= len-1 the state is terminal
        active = (t < lens - 1)[:, None]
        beta = jnp.where(active, new, term)
        emit_grad(t, beta)
        return beta

    jax.lax.fori_loop(0, T - 1, body, beta)


def _prepare(log_probs, logit_lengths, labels, label_lengths, blank):
    """Host-side (XLA) prep: one-hot emit matmul + masks, lane padding."""
    B, T, C = log_probs.shape
    L = labels.shape[1]
    S = 2 * L + 1
    Sp = _round_up(S, LANES)
    Bp = _round_up(B, B_TILE)

    ext = _extend_labels(labels, blank)  # (B, S)
    onehot = jax.nn.one_hot(ext, C, dtype=log_probs.dtype)  # (B, S, C)
    emit = jnp.einsum(
        "bsc,btc->bts", onehot, log_probs, precision=jax.lax.Precision.HIGHEST
    )  # (B, T, S)

    ext_shift2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=-1)[:, :S]
    can_skip = (ext != blank) & (ext != ext_shift2)
    skip = jnp.where(can_skip, 0.0, NEG_INF).astype(jnp.float32)

    s_idx = jnp.arange(S)[None, :]
    smask = jnp.where(s_idx < 2 * label_lengths[:, None] + 1, 0.0, NEG_INF).astype(
        jnp.float32
    )
    term = jnp.where(
        (s_idx == 2 * label_lengths[:, None])
        | ((s_idx == 2 * label_lengths[:, None] - 1) & (label_lengths[:, None] > 0)),
        0.0,
        NEG_INF,
    ).astype(jnp.float32)

    def pad_bs(x, fill):
        return jnp.pad(
            x, ((0, Bp - B), (0, Sp - S)), constant_values=fill
        )

    emit = jnp.pad(
        emit, ((0, Bp - B), (0, 0), (0, Sp - S)), constant_values=NEG_INF
    )
    skip = pad_bs(skip, NEG_INF)
    smask = pad_bs(smask, NEG_INF)
    term = pad_bs(term, NEG_INF)
    lens = jnp.pad(logit_lengths.astype(jnp.int32), (0, Bp - B), constant_values=1)
    lens = lens[:, None]  # (Bp, 1): rank-2 for SMEM blocking
    return emit, skip, smask, term, lens, onehot, (B, T, S, Sp, Bp)


def _alpha_call(emit, skip, smask, lens, interpret):
    Bp, T, Sp = emit.shape
    grid = (Bp // B_TILE,)
    return pl.pallas_call(
        _ctc_alpha_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((B_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B_TILE, T, Sp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B_TILE, Sp), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B_TILE, Sp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (B_TILE, T, Sp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, T, Sp), jnp.float32),
        interpret=interpret,
    )(lens, emit, skip, smask)


def _beta_call(emit, skip, smask, term, lens, alpha, logz, interpret):
    Bp, T, Sp = emit.shape
    grid = (Bp // B_TILE,)
    return pl.pallas_call(
        _ctc_beta_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((B_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B_TILE, T, Sp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B_TILE, Sp), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B_TILE, Sp), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B_TILE, Sp), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B_TILE, T, Sp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (B_TILE, T, Sp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, T, Sp), jnp.float32),
        interpret=interpret,
    )(lens, emit, skip, smask, term, alpha, logz)


def _loss_from_alpha(alpha, term, lens, B):
    """-log sum over terminal states of final alpha (alpha frozen past len)."""
    final = alpha[:, -1, :] + term  # (Bp, Sp)
    ll = jax.nn.logsumexp(final, axis=-1)
    return -ll[:B]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _ctc_nll_pallas(log_probs, logit_lengths, labels, label_lengths, blank, interpret):
    nll, _ = _ctc_fwd(log_probs, logit_lengths, labels, label_lengths, blank, interpret)
    return nll


def _ctc_fwd(log_probs, logit_lengths, labels, label_lengths, blank, interpret):
    emit, skip, smask, term, lens, onehot, dims = _prepare(
        log_probs, logit_lengths, labels, label_lengths, blank
    )
    B, T, S, Sp, Bp = dims
    alpha = _alpha_call(emit, skip, smask, lens, interpret)
    nll = _loss_from_alpha(alpha, term, lens, B)
    residuals = (emit, skip, smask, term, lens, alpha, onehot, nll, dims)
    return nll, residuals


def _ctc_bwd(blank, interpret, residuals, g):
    emit, skip, smask, term, lens, alpha, onehot, nll, dims = residuals
    B, T, S, Sp, Bp = dims
    logz = jnp.pad(-nll, (0, Bp - B))[:, None]  # (Bp, 1) for SMEM
    grad_emit = _beta_call(emit, skip, smask, term, lens, alpha, logz, interpret)
    grad_emit = grad_emit[:B, :, :S]  # (B, T, S)
    # emit = onehot (B,S,C) . logp (B,T,C) -> d logp = onehot^T . d emit
    grad_logp = jnp.einsum(
        "bsc,bts->btc", onehot, grad_emit, precision=jax.lax.Precision.HIGHEST
    )
    grad_logp = grad_logp * g[:, None, None]
    return grad_logp, None, None, None


_ctc_nll_pallas.defvjp(
    lambda lp, ll_, lb, lbl, blank, interp: _ctc_fwd(lp, ll_, lb, lbl, blank, interp),
    _ctc_bwd,
)


def ctc_loss_pallas(
    logits: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
    reduction: str = "mean",
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in CTC loss on the Pallas fwd/bwd kernels (TPU), from logits.

    ``interpret=True`` runs the kernels in the Pallas interpreter (CPU
    tests); on TPU leave it False.
    """
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = _ctc_nll_pallas(
        log_probs, logit_lengths, labels, label_lengths, blank, interpret
    )
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        return jnp.mean(nll / jnp.maximum(label_lengths, 1).astype(nll.dtype))
    raise ValueError(f"unknown reduction {reduction!r}")
