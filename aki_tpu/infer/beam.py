"""Beam-search generation (HF-`generate` parity surface).

The reference's ``generate`` (``src/flamingo.py:137-188``, ``src/vlm.py:
244-300``) forwards ``num_beams`` / ``length_penalty`` / ``early_stopping``
/ ``no_repeat_ngram_size`` / ``num_return_sequences`` to HF's beam search
(after ``repeat_interleave``-ing the vision input over beams).  This module
is the TPU-native equivalent: one prefill at batch B (vision runs ONCE per
image, not once per beam — strictly cheaper than the reference's
pre-expansion), the KV cache expanded to B*K rows, and the whole beam loop
a single ``lax.scan`` with static shapes — beam reordering is a batched
gather on the cache rows, candidate selection is ``top_k`` over (K*V).

Semantics are pinned to ``transformers.generation.BeamSearchScorer``
(beam_search.py:219-1010, the code path the reference pin runs):

- 2K candidates per step; eos candidates ranked >= K are dropped; the
  first K non-eos candidates in rank order continue as live beams;
- an eos candidate at rank < K finishes a hypothesis with score
  ``sum_logprobs / (t+1) ** length_penalty`` (t+1 = generated length
  including the eos); the finished heap keeps the best K;
- ``early_stopping=False`` stops a batch when the worst kept score >=
  ``best_running_sum / (t+1) ** length_penalty`` (HF's heuristic),
  ``True`` stops as soon as K hypotheses exist;
- at the step limit, unfinished batches fold their live beams in with
  score ``sum / max_new_tokens ** length_penalty``;
- ``no_repeat_ngram_size`` bans any token completing an n-gram already
  present in (text prompt + generated) — HF's
  ``NoRepeatNGramLogitsProcessor`` applied to the log-probs before adding
  beam scores.

Differentially tested against HF's own beam search on shared weights
(tests/test_beam.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.common import Policy
from ..models.configs import AKIConfig
from .engine import GenState, decode_step, prefill

NEG = -1.0e9


def _expand_beams(state: GenState, k: int) -> GenState:
    """Repeat every slot row K times (row b -> rows b*K..b*K+K-1). Cache
    leaves carry batch on axis 1, bookkeeping on axis 0."""
    cache = jax.tree.map(
        lambda x: jnp.repeat(x, k, axis=1), state.cache
    )
    return GenState(
        cache=cache,
        kv_valid=jnp.repeat(state.kv_valid, k, axis=0),
        lengths=jnp.repeat(state.lengths, k, axis=0),
        last_logits=jnp.repeat(state.last_logits, k, axis=0),
    )


def _gather_beams(state: GenState, rows: jax.Array) -> GenState:
    """Reorder the B*K flat rows by ``rows`` (beam-parent gather)."""
    cache = jax.tree.map(lambda x: x[:, rows], state.cache)
    return GenState(
        cache=cache,
        kv_valid=state.kv_valid[rows],
        lengths=state.lengths[rows],
        last_logits=state.last_logits[rows],
    )


def _ngram_banned(seq: jax.Array, length: jax.Array, n: int,
                  vocab: int) -> jax.Array:
    """One-hot (V,) mask of tokens banned by the no-repeat-ngram rule for a
    single row: token v is banned iff ``seq[i:i+n-1] == seq[L-n+1:L]`` and
    ``seq[i+n-1] == v`` for some window ``i <= L-n`` (HF
    NoRepeatNGramLogitsProcessor semantics over prompt+generated)."""
    t_tot = seq.shape[0]
    suffix = jnp.take(
        seq, length - (n - 1) + jnp.arange(n - 1), mode="clip"
    )
    starts = jnp.arange(t_tot - n + 1)
    wins = seq[starts[:, None] + jnp.arange(n - 1)[None, :]]
    nxt = seq[starts + (n - 1)]
    match = jnp.all(wins == suffix[None, :], axis=1) & (starts <= length - n)
    return jnp.zeros((vocab,), bool).at[nxt].max(match, mode="drop")


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "max_len", "num_beams", "eos_id",
        "length_penalty", "early_stopping", "no_repeat_ngram_size",
        "num_return_sequences", "suppress_tokens", "policy", "use_flash",
        "order", "kv_int8",
    ),
)
def generate_beam(
    params: dict,
    cfg: AKIConfig,
    input_ids: jax.Array,
    images: jax.Array | None,
    attn_valid: jax.Array,
    max_new_tokens: int,
    max_len: int,
    num_beams: int,
    eos_id: int,
    length_penalty: float = 1.0,
    early_stopping: bool = False,
    no_repeat_ngram_size: int = 0,
    num_return_sequences: int = 1,
    suppress_tokens: tuple[int, ...] = (),
    policy: Policy = Policy(),
    use_flash: bool | None = None,
    order: str = "image_first",
    kv_int8: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Beam-search decode.

    Returns ``(tokens (B, num_return_sequences, max_new_tokens) int32 —
    generated tokens incl. a terminating eos when the hypothesis ended on
    one, pad-filled after; lengths (B, R); scores (B, R) — HF
    ``sequence_scores``, i.e. sum-logprob / len**length_penalty)``.
    """
    assert 1 <= num_return_sequences <= num_beams
    b, t_txt = input_ids.shape
    k = num_beams
    vocab = cfg.output_vocab
    pad = cfg.pad_token_id

    state = prefill(
        params, cfg, input_ids, images, attn_valid, max_len,
        policy=policy, use_flash=use_flash, order=order, kv_int8=kv_int8,
    )
    state = _expand_beams(state, k)

    # only beam 0 live at step 0 (HF: beam_scores[:, 1:] = -1e9), so the
    # first expansion explores K distinct tokens instead of K copies
    beam_scores = jnp.full((b, k), NEG).at[:, 0].set(0.0)

    # text-side sequence buffer for the ngram rule: valid prompt tokens,
    # sentinel -1 elsewhere (never matches a real token), generated tokens
    # appended at the per-row valid length (no pad gap)
    t_tot = t_txt + max_new_tokens
    txt_len = jnp.sum(attn_valid, axis=1).astype(jnp.int32)      # (B,)
    seq0 = jnp.where(attn_valid > 0, input_ids, -1)
    seq_buf = jnp.concatenate(
        [seq0, jnp.full((b, max_new_tokens), -1, jnp.int32)], axis=1
    )
    seq_buf = jnp.repeat(seq_buf[:, None], k, axis=1)            # (B,K,Ttot)
    txt_len = jnp.repeat(txt_len[:, None], k, axis=1)            # (B,K)

    gen_buf = jnp.full((b, k, max_new_tokens), pad, jnp.int32)
    fin_scores = jnp.full((b, k), -jnp.inf)
    fin_seqs = jnp.full((b, k, max_new_tokens), pad, jnp.int32)
    fin_lens = jnp.zeros((b, k), jnp.int32)
    done = jnp.zeros((b,), bool)

    def step(carry, t):
        (state, beam_scores, seq_buf, gen_buf,
         fin_scores, fin_seqs, fin_lens, done) = carry

        logp = jax.nn.log_softmax(
            state.last_logits.reshape(b, k, vocab), axis=-1
        )
        if suppress_tokens:
            # HF SuppressTokensLogitsProcessor: hard-ban a static id set
            logp = logp.at[:, :, jnp.array(suppress_tokens)].set(-jnp.inf)
        if no_repeat_ngram_size > 0:
            banned = jax.vmap(jax.vmap(
                lambda s, l: _ngram_banned(
                    s, l, no_repeat_ngram_size, vocab
                )
            ))(seq_buf, txt_len + t)
            logp = jnp.where(banned, -jnp.inf, logp)

        cand = beam_scores[:, :, None] + logp                   # (B,K,V)
        scores2k, idx2k = jax.lax.top_k(cand.reshape(b, k * vocab), 2 * k)
        tok2k = (idx2k % vocab).astype(jnp.int32)
        par2k = (idx2k // vocab).astype(jnp.int32)
        is_eos = tok2k == eos_id

        # live beams: first K non-eos candidates in rank order
        rank = jnp.arange(2 * k)
        order_key = jnp.where(is_eos, 2 * k + rank, rank)
        live_sel = jnp.argsort(order_key, axis=1)[:, :k]         # (B,K)
        live_scores = jnp.take_along_axis(scores2k, live_sel, axis=1)
        live_tok = jnp.take_along_axis(tok2k, live_sel, axis=1)
        live_par = jnp.take_along_axis(par2k, live_sel, axis=1)

        # finished-hypothesis adds: eos candidates ranked < K
        add_mask = is_eos & (rank[None, :] < k)
        gen_len = (t + 1).astype(jnp.float32)
        add_scores = jnp.where(
            add_mask & ~done[:, None],
            scores2k / gen_len ** length_penalty, -jnp.inf,
        )
        # hypothesis payload: parent's generated prefix + the eos at col t
        par_gen = jnp.take_along_axis(
            gen_buf, par2k[:, :, None], axis=1
        )                                                        # (B,2K,T)
        add_seqs = jax.vmap(jax.vmap(
            lambda row, tt: jax.lax.dynamic_update_slice(
                row, jnp.array([eos_id], jnp.int32), (tt,)
            ), in_axes=(0, None)), in_axes=(0, None))(par_gen, t)
        add_lens = jnp.full((b, 2 * k), t + 1, jnp.int32)

        # merge into the best-K heap
        all_scores = jnp.concatenate([fin_scores, add_scores], axis=1)
        all_seqs = jnp.concatenate([fin_seqs, add_seqs], axis=1)
        all_lens = jnp.concatenate([fin_lens, add_lens], axis=1)
        top_scores, top_idx = jax.lax.top_k(all_scores, k)
        fin_scores = top_scores
        fin_seqs = jnp.take_along_axis(
            all_seqs, top_idx[:, :, None], axis=1
        )
        fin_lens = jnp.take_along_axis(all_lens, top_idx, axis=1)

        # HF done heuristic (early_stopping=False): worst kept >= best
        # possible continuation at the CURRENT generated length
        fin_count = jnp.sum(jnp.isfinite(fin_scores), axis=1)
        best_sum = scores2k[:, 0]
        if early_stopping:
            newly_done = fin_count >= k
        else:
            worst = jnp.min(
                jnp.where(jnp.isfinite(fin_scores), fin_scores, -jnp.inf),
                axis=1,
            )
            newly_done = (fin_count >= k) & (
                worst >= best_sum / gen_len ** length_penalty
            )
        done_now = done | newly_done

        # freeze finished batches: pad token, parent 0, scores unchanged
        live_tok = jnp.where(done[:, None], pad, live_tok)
        live_par = jnp.where(done[:, None], 0, live_par)
        beam_scores = jnp.where(done[:, None], beam_scores, live_scores)

        # reorder rows by parent and decode the chosen tokens
        rows = (jnp.arange(b)[:, None] * k + live_par).reshape(-1)
        state = _gather_beams(state, rows)
        gen_buf = jnp.take_along_axis(gen_buf, live_par[:, :, None], axis=1)
        seq_buf = jnp.take_along_axis(seq_buf, live_par[:, :, None], axis=1)
        gen_buf = jax.vmap(jax.vmap(
            lambda row, tok, tt: jax.lax.dynamic_update_slice(
                row, tok[None], (tt,)
            ), in_axes=(0, 0, None)), in_axes=(0, 0, None)
        )(gen_buf, live_tok, t)
        seq_buf = jax.vmap(jax.vmap(
            lambda row, tok, ll: jax.lax.dynamic_update_slice(
                row, tok[None], (ll,)
            )))(seq_buf, live_tok, txt_len + t)
        state = decode_step(
            params, cfg, state, live_tok.reshape(-1), policy=policy
        )
        return (state, beam_scores, seq_buf, gen_buf,
                fin_scores, fin_seqs, fin_lens, done_now), None

    carry = (state, beam_scores, seq_buf, gen_buf,
             fin_scores, fin_seqs, fin_lens, done)
    carry, _ = jax.lax.scan(
        step, carry, jnp.arange(max_new_tokens, dtype=jnp.int32)
    )
    (state, beam_scores, seq_buf, gen_buf,
     fin_scores, fin_seqs, fin_lens, done) = carry

    # finalize: unfinished batches fold their live beams in (score
    # normalized by the full generated length, no eos append)
    live_scores = jnp.where(
        done[:, None], -jnp.inf,
        beam_scores / float(max_new_tokens) ** length_penalty,
    )
    all_scores = jnp.concatenate([fin_scores, live_scores], axis=1)
    all_seqs = jnp.concatenate([fin_seqs, gen_buf], axis=1)
    all_lens = jnp.concatenate(
        [fin_lens,
         jnp.full((b, k), max_new_tokens, jnp.int32)], axis=1,
    )
    top_scores, top_idx = jax.lax.top_k(all_scores, num_return_sequences)
    out_seqs = jnp.take_along_axis(all_seqs, top_idx[:, :, None], axis=1)
    out_lens = jnp.take_along_axis(all_lens, top_idx, axis=1)
    # pad past each row's length
    pos = jnp.arange(max_new_tokens)[None, None, :]
    out_seqs = jnp.where(pos < out_lens[:, :, None], out_seqs, pad)
    return out_seqs, out_lens, top_scores
