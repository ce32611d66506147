"""Beam-search generation: HF differential + self-consistency.

The reference's ``generate`` surface (``src/flamingo.py:156-162``) forwards
num_beams / length_penalty / no_repeat_ngram_size / num_return_sequences /
early_stopping to HF beam search. ``generate_beam`` is pinned DIRECTLY to
HF's beam search here: same converted weights, same prompts, token-exact
sequences (text-only prompts so the bare HF Phi3 is the oracle; the
decoupled extra-vocab rows — which the bare HF head lacks — are suppressed
on both sides).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from aki_tpu.infer.beam import _ngram_banned, generate_beam
from aki_tpu.infer.engine import generate
from aki_tpu.models.aki import init_aki
from aki_tpu.models.common import F32
from aki_tpu.models.configs import aki_tiny

# reuse the reference-parity fixture (builds the reference torch AKI at
# tiny geometry and converts its state_dict)
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_reference_parity import (  # noqa: E402,F401
    IMG, INITIAL, N_VIS, PAD, VOCAB, models,
)

CFG = aki_tiny()
# ban the structural tokens (<image>/<|endofchunk|> — the decoupled extra
# rows) from beams on BOTH sides; also exercises the suppress_tokens path
SUPPRESS = (INITIAL, INITIAL + 1)


def _text_prompts(rng, b, t):
    """Equal-length, unpadded, media-free prompts (HF decoder-only generate
    wants no right padding; media-free rows make the bare HF Phi3 the exact
    logits oracle)."""
    return rng.randint(3, 31000, size=(b, t))


def _hf_beam(hf_phi, ids, **kw):
    # the parity fixture installs a (*args, **kw) forward shim for 4D-mask
    # inversion; HF generate() inspects forward's signature to route
    # kwargs, so the shim breaks beam search — pop it (2D masks only here).
    # The AKI wrap also replaced lm_head with the 32013-row decoupled head
    # while config.vocab_size still says 32064; HF beam search reshapes by
    # config.vocab_size, so pin it to the real head width for the call.
    shim = hf_phi.__dict__.pop("forward", None)
    old_vocab = hf_phi.config.vocab_size
    hf_phi.config.vocab_size = INITIAL + 2
    try:
        with torch.no_grad():
            out = hf_phi.generate(
                input_ids=torch.tensor(ids),
                attention_mask=torch.ones_like(torch.tensor(ids)),
                do_sample=False,
                pad_token_id=PAD,
                suppress_tokens=list(SUPPRESS),
                return_dict_in_generate=True,
                output_scores=False,
                **kw,
            )
    finally:
        hf_phi.config.vocab_size = old_vocab
        if shim is not None:
            hf_phi.forward = shim
    return out.sequences[:, ids.shape[1]:].numpy()


@pytest.mark.parametrize("ngram", [0, 2])
def test_beam_matches_hf(models, ngram):
    ref, cfg, params = models
    hf_phi = ref.lang_model
    rng = np.random.RandomState(5)
    b, t, k, m = 2, 9, 3, 6
    ids = _text_prompts(rng, b, t)
    dummy_img = np.zeros((b, IMG, IMG, 3), np.float32)

    want = _hf_beam(
        hf_phi, ids, max_new_tokens=m, num_beams=k,
        no_repeat_ngram_size=ngram, eos_token_id=None,
    )
    toks, lens, scores = generate_beam(
        params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(dummy_img),
        jnp.ones((b, t), jnp.int32), max_new_tokens=m, max_len=48,
        num_beams=k, eos_id=-1, no_repeat_ngram_size=ngram,
        suppress_tokens=SUPPRESS, policy=F32, use_flash=False,
    )
    got = np.asarray(toks)[:, 0]
    assert np.asarray(lens)[:, 0].tolist() == [m, m]
    np.testing.assert_array_equal(got, want)


def test_beam_matches_hf_with_eos_and_return_sequences(models):
    """Exercise the finished-hypothesis heap: eos chosen from a mid-beam
    token of the eos-free run so hypotheses actually finish, and
    num_return_sequences=2 checks heap ordering."""
    ref, cfg, params = models
    hf_phi = ref.lang_model
    rng = np.random.RandomState(6)
    b, t, k, m = 2, 8, 3, 7
    ids = _text_prompts(rng, b, t)
    dummy_img = np.zeros((b, IMG, IMG, 3), np.float32)

    free = _hf_beam(hf_phi, ids, max_new_tokens=m, num_beams=k,
                    eos_token_id=None)
    eos = int(free[0, 2])   # a token the search actually reaches

    want = _hf_beam(
        hf_phi, ids, max_new_tokens=m, num_beams=k, eos_token_id=eos,
        num_return_sequences=2,
    )   # (2*b, <=m) — HF flattens (batch, return) and may early-truncate
    toks, lens, scores = generate_beam(
        params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(dummy_img),
        jnp.ones((b, t), jnp.int32), max_new_tokens=m, max_len=48,
        num_beams=k, eos_id=eos, num_return_sequences=2,
        suppress_tokens=SUPPRESS, policy=F32, use_flash=False,
    )
    got = np.asarray(toks)
    glen = np.asarray(lens)
    assert np.all(np.diff(np.asarray(scores), axis=1) <= 1e-6)  # sorted
    for bi in range(b):
        for r in range(2):
            w = want[bi * 2 + r]
            w = w[w != PAD] if PAD in w else w
            g = got[bi, r, :glen[bi, r]]
            np.testing.assert_array_equal(
                g, w, err_msg=f"batch {bi} return {r}"
            )


def test_beam_k1_equals_greedy_vlm():
    """num_beams=1 on the full VLM path (image + media token) must produce
    exactly the greedy engine's tokens."""
    params = init_aki(jax.random.PRNGKey(0), CFG)
    rng = np.random.RandomState(2)
    t = 12
    ids = rng.randint(5, CFG.initial_tokenizer_len - 1, size=(1, t))
    ids[0, 1] = CFG.media_token_id
    ids[0, 8] = CFG.assistant_token_id
    s = CFG.siglip.image_size
    img = rng.randn(1, s, s, 3).astype(np.float32)
    valid = jnp.ones((1, t), jnp.int32)

    want, _ = generate(
        params, CFG, jnp.asarray(ids, jnp.int32), jnp.asarray(img), valid,
        max_new_tokens=5, max_len=48, policy=F32, use_flash=False,
    )
    toks, lens, _ = generate_beam(
        params, CFG, jnp.asarray(ids, jnp.int32), jnp.asarray(img), valid,
        max_new_tokens=5, max_len=48, num_beams=1, eos_id=-1,
        policy=F32, use_flash=False,
    )
    np.testing.assert_array_equal(np.asarray(toks)[0, 0],
                                  np.asarray(want)[0])


def test_ngram_banned_unit():
    """Crafted sequence: with n=2 and suffix token 7, every token that ever
    followed a 7 is banned; nothing else is."""
    seq = jnp.array([5, 7, 9, 3, 7, 4, 8, 7, -1, -1], jnp.int32)
    banned = _ngram_banned(seq, jnp.int32(8), n=2, vocab=12)
    want = np.zeros(12, bool)
    want[9] = True   # 7 -> 9 at position 1
    want[4] = True   # 7 -> 4 at position 4
    np.testing.assert_array_equal(np.asarray(banned), want)

    # suffix doesn't match anything -> nothing banned
    seq2 = jnp.array([1, 2, 3, 4, 5, 6, -1, -1], jnp.int32)
    banned2 = _ngram_banned(seq2, jnp.int32(6), n=3, vocab=8)
    assert not np.asarray(banned2).any()


def test_beam_early_stopping_and_padded_prompts():
    """early_stopping=True runs without error on the VLM path with a
    right-padded batch (our generalization past HF's unpadded B=1), and
    rows keep HF's output contract: eos-terminated rows report
    length = tokens incl. eos, pad elsewhere."""
    params = init_aki(jax.random.PRNGKey(1), CFG)
    rng = np.random.RandomState(3)
    t = 12
    ids = rng.randint(5, CFG.initial_tokenizer_len - 1, size=(2, t))
    ids[:, 1] = CFG.media_token_id
    ids[:, 6] = CFG.assistant_token_id
    valid = np.ones((2, t), np.int32)
    ids[1, 9:] = CFG.pad_token_id
    valid[1, 9:] = 0
    s = CFG.siglip.image_size
    img = rng.randn(2, s, s, 3).astype(np.float32)

    # pick an eos the greedy path hits so hypotheses can finish
    g, _ = generate(
        params, CFG, jnp.asarray(ids, jnp.int32), jnp.asarray(img),
        jnp.asarray(valid), max_new_tokens=4, max_len=48, policy=F32,
        use_flash=False,
    )
    eos = int(np.asarray(g)[0, 1])
    toks, lens, scores = generate_beam(
        params, CFG, jnp.asarray(ids, jnp.int32), jnp.asarray(img),
        jnp.asarray(valid), max_new_tokens=6, max_len=48, num_beams=2,
        eos_id=eos, early_stopping=True, policy=F32, use_flash=False,
    )
    toks, lens = np.asarray(toks), np.asarray(lens)
    assert toks.shape == (2, 1, 6)
    for bi in range(2):
        row, n = toks[bi, 0], lens[bi, 0]
        assert 1 <= n <= 6
        if eos in row.tolist():
            assert row[n - 1] == eos
        assert (row[n:] == CFG.pad_token_id).all()
        assert np.isfinite(np.asarray(scores)[bi, 0])
