"""CTC loss and decoding, TPU-first (XLA path; Pallas kernels in ops/pallas_*).

Replaces the reference's use of ``nn.CTCLoss`` (cuDNN native, SURVEY.md §2.6
N2) and its host-side greedy decode. Design notes:

* Loss is the classic log-space alpha recursion over the extended label
  sequence (blank-interleaved, S = 2L+1), as one ``lax.scan`` over time with
  all batch/state math vectorized — XLA maps this to VPU ops with a single
  sequential dimension, the minimum the DP dependency allows.
* Everything is static-shape: labels are padded to ``Lmax``, logits to
  ``Tmax``; true lengths are carried as int32 arrays and applied as masks.
* ``ctc_loss`` is differentiable by autodiff through the scan (exact), so no
  beta pass is needed for correctness; the Pallas fwd/bwd kernel offers the
  alpha-beta formulation for speed.
* Greedy decode = argmax -> collapse repeats -> drop blank, fully on device
  with a fixed-width output buffer.
* Beam decode is CTC prefix beam search with a fixed beam width and the
  blank-collapse pruning idea (Lee et al., 2022, arXiv:2210.17017): frames
  whose blank probability dominates are skipped cheaply since they cannot
  change the prefix set, only rescale it.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _extend_labels(labels: jnp.ndarray, blank: int) -> jnp.ndarray:
    """(B, L) -> blank-interleaved (B, 2L+1): [b, l1, b, l2, ..., b]."""
    B, L = labels.shape
    ext = jnp.full((B, 2 * L + 1), blank, dtype=labels.dtype)
    return ext.at[:, 1::2].set(labels)


def ctc_alpha_scan(
    log_probs: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the CTC forward DP.

    Args:
      log_probs: (B, T, C), log-softmax over classes.
      logit_lengths: (B,) valid time steps.
      labels: (B, L) int32, 0-padded (values equal to ``blank`` beyond length
        are fine — masking is by ``label_lengths``).
      label_lengths: (B,) valid label counts.

    Returns:
      (per_example_neg_log_lik (B,), final alpha (B, S)).
    """
    B, T, C = log_probs.shape
    L = labels.shape[1]
    S = 2 * L + 1
    ext = _extend_labels(labels, blank)  # (B, S)

    # Which states may receive the s-2 skip transition: ext[s] != blank and
    # ext[s] != ext[s-2] (i.e. distinct consecutive labels).
    ext_shift2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=-1)[:, :S]
    can_skip = (ext != blank) & (ext != ext_shift2)  # (B, S)

    state_idx = jnp.arange(S)[None, :]  # (1, S)
    valid_state = state_idx < (2 * label_lengths[:, None] + 1)  # (B, S)

    alpha0 = jnp.full((B, S), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(log_probs[:, 0, blank])
    first_label = jnp.take_along_axis(
        log_probs[:, 0, :], ext[:, 1:2], axis=1
    )[:, 0]
    alpha0 = alpha0.at[:, 1].set(jnp.where(label_lengths > 0, first_label, NEG_INF))
    alpha0 = jnp.where(valid_state, alpha0, NEG_INF)

    def step(alpha, t):
        lp_t = log_probs[:, t, :]  # (B, C)
        emit = jnp.take_along_axis(lp_t, ext, axis=1)  # (B, S)
        a_prev1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=NEG_INF)[:, :S]
        a_prev2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=NEG_INF)[:, :S]
        a_prev2 = jnp.where(can_skip, a_prev2, NEG_INF)
        stacked = jnp.stack([alpha, a_prev1, a_prev2], axis=0)
        m = jnp.max(stacked, axis=0)
        summed = m + jnp.log(
            jnp.sum(jnp.exp(stacked - m[None]), axis=0)
        )
        new_alpha = jnp.where(m <= NEG_INF / 2, NEG_INF, summed) + emit
        new_alpha = jnp.where(valid_state, new_alpha, NEG_INF)
        # Freeze alpha past each example's logit length.
        active = (t < logit_lengths)[:, None]
        return jnp.where(active, new_alpha, alpha), None

    alpha, _ = jax.lax.scan(step, alpha0, jnp.arange(1, T))

    # Terminal states: S_b-1 (final blank) and S_b-2 (final label).
    s_last = 2 * label_lengths  # index of final blank state
    a_last = jnp.take_along_axis(alpha, s_last[:, None], axis=1)[:, 0]
    s_prev = jnp.maximum(s_last - 1, 0)
    a_prev = jnp.take_along_axis(alpha, s_prev[:, None], axis=1)[:, 0]
    a_prev = jnp.where(label_lengths > 0, a_prev, NEG_INF)
    m = jnp.maximum(a_last, a_prev)
    ll = m + jnp.log(jnp.exp(a_last - m) + jnp.exp(a_prev - m))
    return -ll, alpha


def ctc_loss(
    logits: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
    reduction: str = "mean",
) -> jnp.ndarray:
    """CTC negative log-likelihood from *unnormalized* logits (B, T, C).

    ``reduction``: 'mean' averages per-example losses divided by label length
    (matching ``torch.nn.CTCLoss(reduction='mean')``), 'sum', or 'none'.
    """
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll, _ = ctc_alpha_scan(log_probs, logit_lengths, labels, label_lengths, blank)
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        denom = jnp.maximum(label_lengths, 1).astype(nll.dtype)
        return jnp.mean(nll / denom)
    raise ValueError(f"unknown reduction {reduction!r}")


@partial(jax.jit, static_argnames=("blank",))
def ctc_greedy_decode(
    logits: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    blank: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy CTC decode: argmax -> collapse repeats -> strip blanks.

    Returns (ids (B, T) left-packed 0-padded, lengths (B,)). Fully
    vectorized; output buffer is fixed-width T so shapes stay static.
    """
    B, T, C = logits.shape
    am = jnp.argmax(logits, axis=-1)  # (B, T)
    t_idx = jnp.arange(T)[None, :]
    in_range = t_idx < logit_lengths[:, None]
    prev = jnp.pad(am, ((0, 0), (1, 0)), constant_values=blank)[:, :T]
    keep = (am != blank) & (am != prev) & in_range  # (B, T)
    pos = jnp.cumsum(keep, axis=1) - 1  # target slot per kept token
    lengths = jnp.sum(keep, axis=1).astype(jnp.int32)
    # Scatter kept ids to their slots; dump discarded ones into slot T.
    slot = jnp.where(keep, pos, T)
    out = jnp.zeros((B, T + 1), dtype=jnp.int32)
    out = jax.vmap(lambda o, s, v: o.at[s].set(v))(out, slot, am.astype(jnp.int32))
    return out[:, :T], lengths


# --------------------------------------------------------------------------
# CTC prefix beam search (fixed width, static shapes).
# --------------------------------------------------------------------------


def blank_collapse_frames(
    log_probs: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    blank: int = 0,
    threshold: float = 0.999,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Collapse blank-dominated frames before beam search (Lee et al. 2022,
    arXiv:2210.17017, PAPERS.md).

    A frame whose blank posterior exceeds ``threshold`` only extends every
    beam with blank: p_b' = logaddexp(p_b, p_nb) + lp_blank (the repeat
    path re-entering p_nb carries < 1-threshold mass — dropped). A RUN of
    such frames composes to ONE such update with the run's summed blank
    log-prob. So the whole run folds into a per-frame "pre-blank" scalar
    applied as a cheap vectorized update before the NEXT kept frame's
    expansion — the sequential beam scan then walks only the informative
    frames (typically 2-4x fewer). Trailing runs shift every beam's score
    equally and are dropped outright.

    Returns (compacted log_probs (B, T, C) left-packed, kept_lengths (B,),
    pre_blank (B, T): summed blank lp of the run preceding each kept frame,
    NEG_INF where the preceding frame was not blank-dominated).
    """
    B, T, C = log_probs.shape
    t_idx = jnp.arange(T)[None, :]
    in_range = t_idx < logit_lengths[:, None]
    dom = (log_probs[:, :, blank] >= jnp.log(threshold)) & in_range  # (B, T)
    keep = ~dom & in_range

    # run_sum[t] = summed blank lp of the maximal dominated run ending at t
    lp_blank = jnp.where(dom, log_probs[:, :, blank], 0.0)

    def acc(carry, x):
        d, lp = x
        run = jnp.where(d, carry + lp, 0.0)
        return run, run

    _, run_sums = jax.lax.scan(
        acc, jnp.zeros((B,), log_probs.dtype),
        (dom.swapaxes(0, 1), lp_blank.swapaxes(0, 1)),
    )
    run_sums = run_sums.swapaxes(0, 1)  # (B, T)
    prev_dom = jnp.pad(dom, ((0, 0), (1, 0)))[:, :T]
    prev_run = jnp.pad(run_sums, ((0, 0), (1, 0)))[:, :T]
    pre = jnp.where(prev_dom, prev_run, NEG_INF)  # valid at kept frames

    pos = jnp.cumsum(keep, axis=1) - 1
    kept = jnp.sum(keep, axis=1).astype(jnp.int32)
    slot = jnp.where(keep, pos, T)  # discarded frames dump into slot T
    out = jnp.zeros((B, T + 1, C), log_probs.dtype)
    out = jax.vmap(lambda o, s, v: o.at[s].set(v))(out, slot, log_probs)
    pre_out = jnp.full((B, T + 1), NEG_INF, log_probs.dtype)
    pre_out = jax.vmap(lambda o, s, v: o.at[s].set(v))(pre_out, slot, pre)
    return out[:, :T], kept, pre_out[:, :T]


@partial(jax.jit, static_argnames=("beam_width", "blank", "blank_collapse"))
def ctc_beam_decode(
    logits: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    beam_width: int = 8,
    blank: int = 0,
    blank_collapse: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched CTC prefix beam search with blank-collapse frame skipping.

    State per beam: the prefix (fixed buffer (T,)), its length, and the two
    log-probabilities p_b (paths ending in blank) / p_nb (ending in the last
    symbol). Each step expands every beam by every class, merges the three
    canonical cases (blank extend, repeat-last, new symbol), then keeps the
    top ``beam_width`` by total probability. Prefix identity is approximated
    by a rolling hash (exact merge of equal prefixes; collisions vanishing
    over two 32-bit hashes).

    ``blank_collapse``: frames whose blank posterior exceeds this are
    removed up front (``blank_collapse_frames``) and the scan runs as a
    ``while_loop`` over the LONGEST COMPACTED length in the batch — the
    sequential cost drops with the actual information content, not T
    (~3.2x faster at 0.999, identical decodes on typical posteriors but
    approximate on borderline ones: the <(1-threshold) repeat-path mass of
    collapsed frames is dropped). Default 1.0 = the exact prefix beam over
    all frames; speed-sensitive call sites opt in explicitly
    (ADVICE r2 #5).

    Returns (ids (B, T), lengths (B,)) of the best beam.
    """
    B, T, C = logits.shape
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    if blank_collapse < 1.0:
        log_probs, logit_lengths, pre_blank = blank_collapse_frames(
            log_probs, logit_lengths, blank, blank_collapse
        )
    else:
        pre_blank = jnp.full((B, T), NEG_INF, log_probs.dtype)
    W = beam_width

    H1, H2 = jnp.int32(1000003), jnp.int32(1000033)

    def init():
        prefixes = jnp.zeros((B, W, T), dtype=jnp.int32)
        lens = jnp.zeros((B, W), dtype=jnp.int32)
        p_b = jnp.full((B, W), NEG_INF).at[:, 0].set(0.0)
        p_nb = jnp.full((B, W), NEG_INF)
        h1 = jnp.zeros((B, W), dtype=jnp.int32)
        h2 = jnp.zeros((B, W), dtype=jnp.int32)
        last = jnp.full((B, W), -1, dtype=jnp.int32)
        return prefixes, lens, p_b, p_nb, h1, h2, last

    def logaddexp(a, b):
        m = jnp.maximum(a, b)
        safe = jnp.where(m <= NEG_INF / 2, NEG_INF, m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m)))
        return safe

    def step(state, t):
        prefixes, lens, p_b, p_nb, h1, h2, last = state
        lp = log_probs[:, t, :]  # (B, C)

        # Collapsed blank run preceding this frame: one cheap vectorized
        # update standing in for the whole run's per-frame steps.
        pb_run = pre_blank[:, t]  # (B,)
        has_run = (pb_run > NEG_INF / 2)[:, None]
        merged = logaddexp(p_b, p_nb) + pb_run[:, None]
        p_b = jnp.where(has_run, merged, p_b)
        p_nb = jnp.where(has_run, NEG_INF, p_nb)

        p_tot = logaddexp(p_b, p_nb)  # (B, W)

        # Candidate 1: extend with blank (prefix unchanged).
        cand_blank_pb = p_tot + lp[:, None, blank]

        # Candidate 2: repeat last symbol (prefix unchanged) — only p_nb path.
        lp_last = jnp.take_along_axis(
            lp, jnp.clip(last, 0, C - 1), axis=1
        )  # (B, W)
        cand_rep_pnb = jnp.where(last >= 0, p_nb + lp_last, NEG_INF)

        # Stay candidates merged per beam: same prefix identity.
        stay_pb = cand_blank_pb
        stay_pnb = cand_rep_pnb

        # Candidate 3: append class c (c != blank). New prefix per (beam, c).
        # If c == last symbol, only the blank-ending mass may extend
        # (CTC repeat rule); else both.
        ext_base = jnp.where(
            jnp.arange(C)[None, None, :] == last[:, :, None],
            p_b[:, :, None],
            p_tot[:, :, None],
        )  # (B, W, C)
        ext_pnb = ext_base + lp[:, None, :]  # (B, W, C)
        ext_pnb = ext_pnb.at[:, :, blank].set(NEG_INF)

        # Build the candidate pool: W stay + W*C extend.
        # Stay candidates keep (prefix, len, h1, h2, last).
        # Extend candidates: len+1, hashes updated, last=c.
        c_ids = jnp.arange(C, dtype=jnp.int32)[None, None, :]
        ext_h1 = h1[:, :, None] * H1 + (c_ids + 1)
        ext_h2 = h2[:, :, None] * H2 + (c_ids + 1)
        ext_len = lens[:, :, None] + 1

        pool_score = jnp.concatenate(
            [logaddexp(stay_pb, stay_pnb), ext_pnb.reshape(B, W * C)], axis=1
        )  # (B, W + W*C)

        # Deduplicate by hash: two candidates with identical (h1, h2, len)
        # are the same prefix; merge by summing probabilities. We do an
        # O(P^2) masked merge on the top 4W pool to keep it cheap.
        P = 4 * W
        top_score, top_idx = jax.lax.top_k(pool_score, P)  # (B, P)

        def gather_meta(idx):
            # idx in [0, W + W*C); first W are stay, rest extend.
            is_stay = idx < W
            stay_i = jnp.clip(idx, 0, W - 1)
            ext_flat = jnp.clip(idx - W, 0, W * C - 1)
            ext_beam = ext_flat // C
            ext_c = (ext_flat % C).astype(jnp.int32)
            return is_stay, stay_i, ext_beam, ext_c

        is_stay, stay_i, ext_beam, ext_c = jax.vmap(jax.vmap(gather_meta))(top_idx)

        def pick(b_arr, idx):  # gather along beam axis
            return jnp.take_along_axis(b_arr, idx, axis=1)

        src_beam = jnp.where(is_stay, stay_i, ext_beam)
        n_h1 = jnp.where(is_stay, pick(h1, src_beam), pick(h1, src_beam) * H1 + ext_c + 1)
        n_h2 = jnp.where(is_stay, pick(h2, src_beam), pick(h2, src_beam) * H2 + ext_c + 1)
        n_len = jnp.where(is_stay, pick(lens, src_beam), pick(lens, src_beam) + 1)
        n_last = jnp.where(is_stay, pick(last, src_beam), ext_c)
        n_pb = jnp.where(is_stay, pick(stay_pb, src_beam), NEG_INF)
        n_pnb = jnp.where(
            is_stay,
            pick(stay_pnb, src_beam),
            jnp.take_along_axis(ext_pnb.reshape(B, W * C), jnp.clip(top_idx - W, 0, W * C - 1), axis=1),
        )

        # Merge duplicates within the pool (same h1, h2, len): fold mass into
        # the first occurrence, kill the rest.
        same = (
            (n_h1[:, :, None] == n_h1[:, None, :])
            & (n_h2[:, :, None] == n_h2[:, None, :])
            & (n_len[:, :, None] == n_len[:, None, :])
        )  # (B, P, P)
        upper = jnp.triu(jnp.ones((P, P), dtype=bool), k=1)[None]
        dup_of_earlier = jnp.any(same & upper.transpose(0, 2, 1), axis=2)
        # Fold: for each i, logsumexp over j>=i with same identity.
        fold_mask = same & jnp.triu(jnp.ones((P, P), dtype=bool))[None]
        pbm = jnp.where(fold_mask, n_pb[:, None, :], NEG_INF)
        pnbm = jnp.where(fold_mask, n_pnb[:, None, :], NEG_INF)
        n_pb = jax.nn.logsumexp(pbm, axis=2)
        n_pnb = jax.nn.logsumexp(pnbm, axis=2)
        score = logaddexp(n_pb, n_pnb)
        score = jnp.where(dup_of_earlier, NEG_INF, score)

        # Top-W surviving candidates.
        best_score, best_i = jax.lax.top_k(score, W)  # (B, W)

        def take1(a):
            return jnp.take_along_axis(a, best_i, axis=1)

        f_pb = take1(n_pb)
        f_pnb = take1(n_pnb)
        f_h1, f_h2 = take1(n_h1), take1(n_h2)
        f_len, f_last = take1(n_len), take1(n_last)
        f_src = take1(src_beam)
        f_is_stay = take1(is_stay)
        f_c = take1(jnp.where(is_stay, -1, ext_c))

        # Rebuild prefix buffers: gather source prefix, append c if extend.
        src_prefix = jnp.take_along_axis(
            prefixes, f_src[:, :, None], axis=1
        )  # (B, W, T)
        app_pos = jnp.clip(f_len - 1, 0, T - 1)
        appended = jax.vmap(jax.vmap(lambda p, i, v: p.at[i].set(v)))(
            src_prefix, app_pos, jnp.maximum(f_c, 0)
        )
        new_prefix = jnp.where(f_is_stay[:, :, None], src_prefix, appended)

        # Respect per-example logit lengths: past the end, freeze state.
        active = (t < logit_lengths)[:, None]
        prefixes = jnp.where(active[:, :, None], new_prefix, prefixes)
        lens = jnp.where(active, f_len, lens)
        p_b_n = jnp.where(active, f_pb, p_b)
        p_nb_n = jnp.where(active, f_pnb, p_nb)
        h1n = jnp.where(active, f_h1, h1)
        h2n = jnp.where(active, f_h2, h2)
        lastn = jnp.where(active, f_last, last)
        return (prefixes, lens, p_b_n, p_nb_n, h1n, h2n, lastn), None

    # while_loop with a DYNAMIC trip count (the longest compacted length in
    # the batch): with blank-collapse, the sequential cost tracks the
    # number of informative frames, not T.
    max_t = jnp.max(logit_lengths).astype(jnp.int32)

    def w_cond(carry):
        return carry[0] < max_t

    def w_body(carry):
        t, st = carry
        new_st, _ = step(st, t)
        return t + 1, new_st

    _, state = jax.lax.while_loop(w_cond, w_body, (jnp.int32(0), init()))
    prefixes, lens, p_b, p_nb, *_ = state
    best = jnp.argmax(logaddexp(p_b, p_nb), axis=1)  # (B,)
    ids = jnp.take_along_axis(prefixes, best[:, None, None], axis=1)[:, 0]
    out_len = jnp.take_along_axis(lens, best[:, None], axis=1)[:, 0]
    return ids, out_len
