"""2D-CTC: CTC generalized to a 2-D probability map (the reference's
headline contribution, arXiv:1907.09705; SURVEY.md §2.4 / §3.5).

A path is a sequence ((h_1, c_1), ..., (h_T, c_T)): at each time column the
path sits at one of H heights and emits one class. The model predicts
  * emission log-probs   log P(c | t, h):  (B, T, H, C)
  * height distribution:
      - 'independent': log q(h | t): (B, T, H) — heights independent across
        columns. Then heights marginalize per column and 2D-CTC reduces
        exactly to 1-D CTC over fused emissions
        log ~P(c|t) = logsumexp_h [ log q(h|t) + log P(c|t,h) ].
      - 'markov': log A(h_t | h_{t-1}, t): (B, T, H, H) — a height-transition
        chain. Full DP over (t, h, s) with the label recursion identical to
        1-D CTC; height and label transitions commute, so each step is a
        label-axis pad/max trick followed by a logsumexp contraction over the
        previous height (H is small, ~8, so this is VPU-cheap).

Both paths are single `lax.scan`s over time: static shapes, differentiable
by autodiff (exact), Pallas offload optional later.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .ctc import NEG_INF, _extend_labels, ctc_alpha_scan, ctc_greedy_decode


def fuse_heights(emit_log_probs: jnp.ndarray, height_log_probs: jnp.ndarray) -> jnp.ndarray:
    """Marginalize heights per column: (B,T,H,C)+(B,T,H) -> (B,T,C) log-probs."""
    return jax.nn.logsumexp(
        emit_log_probs + height_log_probs[..., None], axis=2
    )


def ctc2d_loss_independent(
    emit_log_probs: jnp.ndarray,
    height_log_probs: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
    reduction: str = "mean",
) -> jnp.ndarray:
    """2D-CTC NLL with per-column independent height distributions."""
    fused = fuse_heights(emit_log_probs, height_log_probs)
    nll, _ = ctc_alpha_scan(fused, logit_lengths, labels, label_lengths, blank)
    return _reduce(nll, label_lengths, reduction)


def _reduce(nll, label_lengths, reduction):
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        return jnp.mean(nll / jnp.maximum(label_lengths, 1).astype(nll.dtype))
    raise ValueError(f"unknown reduction {reduction!r}")


def ctc2d_loss_markov(
    emit_log_probs: jnp.ndarray,
    trans_log_probs: jnp.ndarray,
    init_height_log_probs: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
    reduction: str = "mean",
) -> jnp.ndarray:
    """2D-CTC NLL with a Markov height chain.

    Args:
      emit_log_probs: (B, T, H, C) log P(c | t, h).
      trans_log_probs: (B, T, H, H) log A[t](h_prev -> h); row h_prev,
        col h_new; entry [b, t] used on the transition into column t
        (t >= 1).
      init_height_log_probs: (B, H) log distribution of h_1.
      others: as in ops.ctc.
    """
    B, T, H, C = emit_log_probs.shape
    L = labels.shape[1]
    S = 2 * L + 1
    ext = _extend_labels(labels, blank)  # (B, S)

    ext_shift2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=-1)[:, :S]
    can_skip = (ext != blank) & (ext != ext_shift2)
    state_idx = jnp.arange(S)[None, :]
    valid_state = state_idx < (2 * label_lengths[:, None] + 1)

    def emit_at(t):
        # (B, H, S): emission of the state's symbol at every height.
        lp = emit_log_probs[:, t]  # (B, H, C)
        return jnp.take_along_axis(
            lp, jnp.broadcast_to(ext[:, None, :], (B, H, S)), axis=2
        )

    # t = 0
    alpha0 = jnp.full((B, H, S), NEG_INF)
    e0 = emit_at(0)
    alpha0 = alpha0.at[:, :, 0].set(init_height_log_probs + e0[:, :, 0])
    a1 = init_height_log_probs + e0[:, :, 1]
    alpha0 = alpha0.at[:, :, 1].set(
        jnp.where((label_lengths > 0)[:, None], a1, NEG_INF)
    )
    alpha0 = jnp.where(valid_state[:, None, :], alpha0, NEG_INF)

    def step(alpha, t):
        # 1) label transitions (per height, standard CTC pad trick)
        a1 = jnp.pad(alpha, ((0, 0), (0, 0), (1, 0)), constant_values=NEG_INF)[:, :, :S]
        a2 = jnp.pad(alpha, ((0, 0), (0, 0), (2, 0)), constant_values=NEG_INF)[:, :, :S]
        a2 = jnp.where(can_skip[:, None, :], a2, NEG_INF)
        stacked = jnp.stack([alpha, a1, a2], axis=0)
        m = jnp.max(stacked, axis=0)
        lbl = jnp.where(
            m <= NEG_INF / 2, NEG_INF, m + jnp.log(jnp.sum(jnp.exp(stacked - m[None]), axis=0))
        )  # (B, H, S)
        # 2) height transition: logsumexp over h_prev of lbl[h_prev] + A[h_prev, h]
        A_t = trans_log_probs[:, t]  # (B, Hprev, Hnew)
        x = lbl[:, :, None, :] + A_t[:, :, :, None]  # (B, Hprev, Hnew, S)
        moved = jax.nn.logsumexp(x, axis=1)  # (B, Hnew, S)
        new_alpha = moved + emit_at(t)
        new_alpha = jnp.where(valid_state[:, None, :], new_alpha, NEG_INF)
        active = (t < logit_lengths)[:, None, None]
        return jnp.where(active, new_alpha, alpha), None

    alpha, _ = jax.lax.scan(step, alpha0, jnp.arange(1, T))

    # Marginalize height, then read terminal states.
    alpha_s = jax.nn.logsumexp(alpha, axis=1)  # (B, S)
    s_last = 2 * label_lengths
    a_last = jnp.take_along_axis(alpha_s, s_last[:, None], axis=1)[:, 0]
    s_prev = jnp.maximum(s_last - 1, 0)
    a_prev = jnp.take_along_axis(alpha_s, s_prev[:, None], axis=1)[:, 0]
    a_prev = jnp.where(label_lengths > 0, a_prev, NEG_INF)
    m = jnp.maximum(a_last, a_prev)
    nll = -(m + jnp.log(jnp.exp(a_last - m) + jnp.exp(a_prev - m)))
    return _reduce(nll, label_lengths, reduction)


@partial(jax.jit, static_argnames=("blank",))
def ctc2d_greedy_decode(
    emit_log_probs: jnp.ndarray,
    height_log_probs: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    blank: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy 2D-CTC decode (independent heights), matching the reference's
    eval path (SURVEY.md §3.5): per-column best height, then class argmax at
    that height, then 1-D CTC collapse.
    """
    best_h = jnp.argmax(height_log_probs, axis=2)  # (B, T)
    picked = jnp.take_along_axis(
        emit_log_probs, best_h[:, :, None, None], axis=2
    )[:, :, 0, :]  # (B, T, C)
    return ctc_greedy_decode(picked, logit_lengths, blank=blank)


@partial(jax.jit, static_argnames=("blank",))
def ctc2d_viterbi_height_decode(
    emit_log_probs: jnp.ndarray,
    trans_log_probs: jnp.ndarray,
    init_height_log_probs: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    blank: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Markov-height decode: Viterbi over the height chain scored by the
    per-column max-class emission, then greedy CTC along the chosen path.
    """
    B, T, H, C = emit_log_probs.shape
    col_score = jnp.max(emit_log_probs, axis=3)  # (B, T, H)

    def vstep(carry, t):
        delta = carry  # (B, H)
        cand = delta[:, :, None] + trans_log_probs[:, t]  # (B, Hprev, Hnew)
        back = jnp.argmax(cand, axis=1)  # (B, Hnew)
        delta_new = jnp.max(cand, axis=1) + col_score[:, t]
        active = (t < logit_lengths)[:, None]
        return jnp.where(active, delta_new, delta), back

    delta0 = init_height_log_probs + col_score[:, 0]
    delta, backs = jax.lax.scan(vstep, delta0, jnp.arange(1, T))  # backs: (T-1, B, H)

    h_last = jnp.argmax(delta, axis=1)  # (B,)

    def backtrack(carry, back_t):
        h = carry  # (B,)
        h_prev = jnp.take_along_axis(back_t, h[:, None], axis=1)[:, 0]
        return h_prev, h

    h0, hs = jax.lax.scan(backtrack, h_last, backs, reverse=True)
    heights = jnp.concatenate([h0[None], hs], axis=0).T  # (B, T)

    picked = jnp.take_along_axis(
        emit_log_probs, heights[:, :, None, None], axis=2
    )[:, :, 0, :]
    return ctc_greedy_decode(picked, logit_lengths, blank=blank)
