"""Pallas TPU kernels for the 2D-CTC loss (Markov height chain).

SURVEY.md §2.6 N3: the reference runs its 2D-CTC DP as batched torch ops on
GPU; the rebuild's XLA scan (ops/ctc2d.py) already matches that. This module
is the Pallas fwd/bwd pair so the whole (time x height x label-state) DP
lives in VMEM, mirroring ops/pallas_ctc.py:

* emission gather -> one-hot MXU matmul outside the kernel:
    emit[b, t, h, s] = sum_c onehot(ext)[b, s, c] * logP[b, t, h, c]
* forward kernel: alpha (Bt, H, S) in VMEM; per step a CTC label move
  (lane rolls) then a height contraction over H (static unrolled
  logsumexp, H is 4-8) with the per-column transition matrix A_t.
* backward kernel: beta DP + exact gradients
    d nll / d emit[t,h,s]   = -exp(alpha + beta - logZ)
    d nll / d A_t[h',h]     = -sum_s exp(lblmove(alpha[t-1])[h',s]
                               + A_t[h',h] + emit[t,h,s] + beta[t,h,s] - logZ)
    d nll / d init[h]       = sum_s d nll / d emit[0,h,s]   (outside)
* custom_vjp over (emit_log_probs, trans_log_probs, init_log_probs).

Numerical contract: matches ctc2d_loss_markov (which matches brute-force
path enumeration) to fp32 round-off; tests enforce it in interpret mode and
the same kernels compile for real TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ctc import NEG_INF, _extend_labels
from .pallas_ctc import _logsumexp3, _round_up, _shift_left, _shift_right

LANES = 128
B_TILE = 8


def _logsumexp_list(xs):
    m = xs[0]
    for x in xs[1:]:
        m = jnp.maximum(m, x)
    safe = jnp.maximum(m, NEG_INF)
    s = sum(jnp.exp(x - safe) for x in xs)
    out = safe + jnp.log(s)
    return jnp.where(m <= NEG_INF / 2, NEG_INF, out)


def _label_move(a, skip):
    """CTC label transitions for every height plane: a (Bt, H, S)."""
    a1 = _shift_right(a, 1)
    a2 = _shift_right(a, 2) + skip[:, None, :]
    return _logsumexp3(a, a1, a2)


def _ctc2d_alpha_kernel(
    lens_ref, emit_ref, trans_ref, init_ref, skip_ref, smask_ref, alpha_ref
):
    """emit (Bt,T,H,S); trans (Bt,T,H,H); init (Bt,H); skip/smask (Bt,S)."""
    T, H = emit_ref.shape[1], emit_ref.shape[2]
    skip = skip_ref[:]
    smask = smask_ref[:]
    lens = lens_ref[:, 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, skip.shape, 1)
    init_lbl_mask = jnp.where(lane <= 1, 0.0, NEG_INF)  # states {0, 1}

    init_h = init_ref[:]  # (Bt, H)
    alpha = (
        emit_ref[:, 0, :, :]
        + init_h[:, :, None]
        + (init_lbl_mask + smask)[:, None, :]
    )
    alpha_ref[:, 0, :, :] = alpha

    def body(t, alpha):
        lbl = _label_move(alpha, skip)  # (Bt, H, S)
        A = trans_ref[:, t, :, :]  # (Bt, Hprev, Hnew)
        moved = [
            _logsumexp_list([lbl[:, hp, :] + A[:, hp, h][:, None] for hp in range(H)])
            for h in range(H)
        ]
        moved = jnp.stack(moved, axis=1)  # (Bt, H, S)
        new = moved + emit_ref[:, t, :, :] + smask[:, None, :]
        active = (t < lens)[:, None, None]
        alpha = jnp.where(active, new, alpha)
        alpha_ref[:, t, :, :] = alpha
        return alpha

    jax.lax.fori_loop(1, T, body, alpha)


def _ctc2d_beta_kernel(
    lens_ref, emit_ref, trans_ref, skip_ref, smask_ref, term_ref, alpha_ref,
    logz_ref, grad_emit_ref, grad_trans_ref,
):
    T, H = emit_ref.shape[1], emit_ref.shape[2]
    skip = skip_ref[:]
    smask = smask_ref[:]
    term = term_ref[:]  # (Bt, S)
    lens = lens_ref[:, 0]
    logz = logz_ref[:, 0]

    beta = jnp.broadcast_to(term[:, None, :], emit_ref.shape[0:1] + (H, term.shape[1]))

    def emit_grad(t, beta):
        gamma = alpha_ref[:, t, :, :] + beta
        g = -jnp.exp(gamma - logz[:, None, None])
        g = jnp.where((t < lens)[:, None, None], g, 0.0)
        grad_emit_ref[:, t, :, :] = g

    emit_grad(T - 1, beta)
    grad_trans_ref[:, T - 1, :, :] = jnp.zeros_like(trans_ref[:, 0, :, :])

    def trans_grad(t, beta):
        # xi[h', h] = sum_s exp(lblmove(alpha[t-1])[h',s] + A_t[h',h]
        #                        + emit[t,h,s] + beta[t,h,s] - logZ)
        lbl_prev = _label_move(alpha_ref[:, t - 1, :, :], skip)  # (Bt,H,S)
        A = trans_ref[:, t, :, :]
        tgt = emit_ref[:, t, :, :] + beta + smask[:, None, :]  # (Bt,H,S)
        rows = []
        for hp in range(H):
            cols = []
            for h in range(H):
                x = lbl_prev[:, hp, :] + A[:, hp, h][:, None] + tgt[:, h, :]
                cols.append(-jnp.sum(jnp.exp(x - logz[:, None]), axis=1))
            rows.append(jnp.stack(cols, axis=1))
        xi = jnp.stack(rows, axis=1)  # (Bt, Hprev, Hnew)
        xi = jnp.where((t < lens)[:, None, None], xi, 0.0)
        grad_trans_ref[:, t, :, :] = xi

    trans_grad(T - 1, beta) if T > 1 else None

    def body(i, beta):
        t = T - 2 - i
        nxt = beta + emit_ref[:, t + 1, :, :] + smask[:, None, :]  # (Bt,H,S)
        mv = _logsumexp3(nxt, _shift_left(nxt, 1), _shift_left(nxt + skip[:, None, :], 2))
        A = trans_ref[:, t + 1, :, :]  # (Bt, Hprev=h, Hnew=h'')
        newb = [
            _logsumexp_list([mv[:, hn, :] + A[:, h, hn][:, None] for hn in range(H)])
            for h in range(H)
        ]
        newb = jnp.stack(newb, axis=1)
        active = (t < lens - 1)[:, None, None]
        beta = jnp.where(active, newb, jnp.broadcast_to(term[:, None, :], newb.shape))
        emit_grad(t, beta)

        @pl.when(t > 0)
        def _():
            trans_grad(t, beta)

        @pl.when(t == 0)
        def _():
            grad_trans_ref[:, 0, :, :] = jnp.zeros_like(A)

        return beta

    jax.lax.fori_loop(0, T - 1, body, beta)


def _prepare2d(emit_lp, trans_lp, init_lp, logit_lengths, labels, label_lengths, blank):
    B, T, H, C = emit_lp.shape
    L = labels.shape[1]
    S = 2 * L + 1
    Sp = _round_up(S, LANES)
    Bp = _round_up(B, B_TILE)

    ext = _extend_labels(labels, blank)
    onehot = jax.nn.one_hot(ext, C, dtype=emit_lp.dtype)  # (B, S, C)
    emit = jnp.einsum(
        "bsc,bthc->bths", onehot, emit_lp, precision=jax.lax.Precision.HIGHEST
    )  # (B, T, H, S)

    ext_shift2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=-1)[:, :S]
    can_skip = (ext != blank) & (ext != ext_shift2)
    skip = jnp.where(can_skip, 0.0, NEG_INF).astype(jnp.float32)
    s_idx = jnp.arange(S)[None, :]
    smask = jnp.where(s_idx < 2 * label_lengths[:, None] + 1, 0.0, NEG_INF).astype(jnp.float32)
    term = jnp.where(
        (s_idx == 2 * label_lengths[:, None])
        | ((s_idx == 2 * label_lengths[:, None] - 1) & (label_lengths[:, None] > 0)),
        0.0,
        NEG_INF,
    ).astype(jnp.float32)

    emit = jnp.pad(emit, ((0, Bp - B), (0, 0), (0, 0), (0, Sp - S)), constant_values=NEG_INF)
    trans = jnp.pad(trans_lp.astype(jnp.float32), ((0, Bp - B), (0, 0), (0, 0), (0, 0)))
    init = jnp.pad(init_lp.astype(jnp.float32), ((0, Bp - B), (0, 0)))

    def pad_bs(x, fill):
        return jnp.pad(x, ((0, Bp - B), (0, Sp - S)), constant_values=fill)

    skip, smask, term = pad_bs(skip, NEG_INF), pad_bs(smask, NEG_INF), pad_bs(term, NEG_INF)
    lens = jnp.pad(logit_lengths.astype(jnp.int32), (0, Bp - B), constant_values=1)[:, None]
    return emit, trans, init, skip, smask, term, lens, onehot, (B, T, H, S, Sp, Bp)


def _vm(shape, idx):
    return pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)


def _alpha2d_call(emit, trans, init, skip, smask, lens, interpret):
    Bp, T, H, Sp = emit.shape
    return pl.pallas_call(
        _ctc2d_alpha_kernel,
        grid=(Bp // B_TILE,),
        in_specs=[
            _vm((B_TILE, 1), lambda i: (i, 0)),
            _vm((B_TILE, T, H, Sp), lambda i: (i, 0, 0, 0)),
            _vm((B_TILE, T, H, H), lambda i: (i, 0, 0, 0)),
            _vm((B_TILE, H), lambda i: (i, 0)),
            _vm((B_TILE, Sp), lambda i: (i, 0)),
            _vm((B_TILE, Sp), lambda i: (i, 0)),
        ],
        out_specs=_vm((B_TILE, T, H, Sp), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, T, H, Sp), jnp.float32),
        interpret=interpret,
    )(lens, emit, trans, init, skip, smask)


def _beta2d_call(emit, trans, skip, smask, term, lens, alpha, logz, interpret):
    Bp, T, H, Sp = emit.shape
    return pl.pallas_call(
        _ctc2d_beta_kernel,
        grid=(Bp // B_TILE,),
        in_specs=[
            _vm((B_TILE, 1), lambda i: (i, 0)),
            _vm((B_TILE, T, H, Sp), lambda i: (i, 0, 0, 0)),
            _vm((B_TILE, T, H, H), lambda i: (i, 0, 0, 0)),
            _vm((B_TILE, Sp), lambda i: (i, 0)),
            _vm((B_TILE, Sp), lambda i: (i, 0)),
            _vm((B_TILE, Sp), lambda i: (i, 0)),
            _vm((B_TILE, T, H, Sp), lambda i: (i, 0, 0, 0)),
            _vm((B_TILE, 1), lambda i: (i, 0)),
        ],
        out_specs=(
            _vm((B_TILE, T, H, Sp), lambda i: (i, 0, 0, 0)),
            _vm((B_TILE, T, H, H), lambda i: (i, 0, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, T, H, Sp), jnp.float32),
            jax.ShapeDtypeStruct((Bp, T, H, H), jnp.float32),
        ),
        interpret=interpret,
    )(lens, emit, trans, skip, smask, term, alpha, logz)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _ctc2d_nll_pallas(
    emit_lp, trans_lp, init_lp, logit_lengths, labels, label_lengths, blank, interpret
):
    nll, _ = _fwd2d(
        emit_lp, trans_lp, init_lp, logit_lengths, labels, label_lengths, blank, interpret
    )
    return nll


def _fwd2d(emit_lp, trans_lp, init_lp, logit_lengths, labels, label_lengths, blank, interpret):
    emit, trans, init, skip, smask, term, lens, onehot, dims = _prepare2d(
        emit_lp, trans_lp, init_lp, logit_lengths, labels, label_lengths, blank
    )
    B, T, H, S, Sp, Bp = dims
    alpha = _alpha2d_call(emit, trans, init, skip, smask, lens, interpret)
    final = alpha[:, -1, :, :] + term[:, None, :]
    nll = -jax.nn.logsumexp(final.reshape(Bp, -1), axis=-1)[:B]
    return nll, (emit, trans, skip, smask, term, lens, alpha, onehot, nll, dims)


def _bwd2d(blank, interpret, residuals, g):
    emit, trans, skip, smask, term, lens, alpha, onehot, nll, dims = residuals
    B, T, H, S, Sp, Bp = dims
    logz = jnp.pad(-nll, (0, Bp - B))[:, None]
    grad_emit, grad_trans = _beta2d_call(
        emit, trans, skip, smask, term, lens, alpha, logz, interpret
    )
    grad_emit = grad_emit[:B, :, :, :S]
    grad_trans = grad_trans[:B]
    grad_emit_lp = jnp.einsum(
        "bsc,bths->bthc", onehot, grad_emit, precision=jax.lax.Precision.HIGHEST
    )
    grad_init = jnp.sum(grad_emit[:, 0, :, :], axis=-1)  # (B, H)
    gb = g[:, None, None, None]
    return (
        grad_emit_lp * gb,
        grad_trans * gb,
        grad_init * g[:, None],
        None,
        None,
        None,
    )


_ctc2d_nll_pallas.defvjp(
    lambda e, t, i, ll, lb, lbl, blank, interp: _fwd2d(e, t, i, ll, lb, lbl, blank, interp),
    _bwd2d,
)


def ctc2d_loss_markov_pallas(
    emit_log_probs: jnp.ndarray,
    trans_log_probs: jnp.ndarray,
    init_height_log_probs: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
    reduction: str = "mean",
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for ops.ctc2d.ctc2d_loss_markov on the Pallas kernels."""
    nll = _ctc2d_nll_pallas(
        emit_log_probs.astype(jnp.float32),
        trans_log_probs.astype(jnp.float32),
        init_height_log_probs.astype(jnp.float32),
        logit_lengths,
        labels,
        label_lengths,
        blank,
        interpret,
    )
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        return jnp.mean(nll / jnp.maximum(label_lengths, 1).astype(nll.dtype))
    raise ValueError(f"unknown reduction {reduction!r}")
