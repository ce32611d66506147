"""HFTokenizer (the production adapter) against a real trained tokenizer.

sentencepiece isn't in the image, so the slow path can't load; the fast
backend (`tokenizers`) exercises the same adapter code: special-token
registration order, id layout (media/eoc appended AFTER <pad>), encode
without auto-specials, train_encode bracketing, and the no-space template
boundary behavior that the HashTokenizer fixture can only approximate.
"""

import json

import pytest

tokenizers = pytest.importorskip("tokenizers")

from aki_tpu.data.tokenizer import HFTokenizer, train_encode  # noqa: E402


@pytest.fixture(scope="module")
def tok_dir(tmp_path_factory):
    """Train a tiny byte-level BPE with llama-ish specials, save HF-style."""
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    d = tmp_path_factory.mktemp("hf_tok")
    tk = Tokenizer(models.BPE(unk_token="<unk>"))
    tk.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=True)
    trainer = trainers.BpeTrainer(
        vocab_size=400,
        special_tokens=["<unk>", "<s>", "</s>", "<|system|>", "<|user|>",
                        "<|assistant|>", "<|end|>"],
    )
    corpus = [
        "A photo of a cat on a mat.",
        "Answer with the option's letter from the given choices directly.",
        "What color is the sky? blue green red",
        "the quick brown fox jumps over the lazy dog",
    ] * 8
    tk.train_from_iterator(corpus, trainer)
    tk.save(str(d / "tokenizer.json"))
    (d / "tokenizer_config.json").write_text(json.dumps({
        "tokenizer_class": "PreTrainedTokenizerFast",
        "bos_token": "<s>", "eos_token": "</s>", "unk_token": "<unk>",
    }))
    return str(d)


def test_layout_and_specials(tok_dir):
    t = HFTokenizer(tok_dir, use_fast=True)
    info = t.info
    # <pad> added first, then <image>/<|endofchunk|> appended after
    # initial_len (factory.py:100-109 + add_special_tokens order)
    assert info.media_id == info.initial_len
    assert info.end_of_chunk_id == info.initial_len + 1
    assert info.vocab_size == info.initial_len + 2
    assert info.pad_id not in (info.media_id, info.end_of_chunk_id)
    assert info.bos_id != info.eos_id


def test_pad_aliasing_eos_gets_dedicated_pad(tok_dir, tmp_path):
    """Phi-3.5 ships pad_token == eos_token == <|endoftext|>; the reference
    factory (factory.py:118-123) adds a dedicated <pad> in that case and
    the released checkpoint's vocab layout depends on it — regression for
    the adapter only checking `pad_token is None`."""
    import shutil

    d = tmp_path / "tok_padeos"
    shutil.copytree(tok_dir, d)
    cfgf = d / "tokenizer_config.json"
    cfg = json.loads(cfgf.read_text())
    cfg["pad_token"] = cfg["eos_token"]     # the Phi-3.5 situation
    cfgf.write_text(json.dumps(cfg))

    t = HFTokenizer(str(d), use_fast=True)
    info = t.info
    assert info.pad_id != info.eos_id, "pad must not alias eos"
    # layout invariants still hold: <pad> inside initial_len, media after
    assert info.pad_id < info.initial_len
    assert info.media_id == info.initial_len


def test_specials_tokenize_without_spaces(tok_dir):
    """The no-space production templates must split on special tokens."""
    t = HFTokenizer(tok_dir, use_fast=True)
    ids = t.encode("<image>cat<|endofchunk|>")
    assert ids[0] == t.info.media_id
    assert ids[-1] == t.info.end_of_chunk_id
    assert len(ids) >= 3
    # encode adds no specials by itself (eval/demo semantics)
    assert t.info.bos_id not in ids and t.info.eos_id not in ids


def test_train_encode_brackets_and_truncates(tok_dir):
    t = HFTokenizer(tok_dir, use_fast=True)
    ids = train_encode(t, "<image>A photo of a cat on a mat.<|endofchunk|>",
                       max_length=128)
    assert ids[0] == t.info.bos_id and ids[-1] == t.info.eos_id
    assert ids[1] == t.info.media_id
    assert t.info.end_of_chunk_id in ids
    short = train_encode(t, "the quick brown fox " * 50, max_length=16)
    assert len(short) == 16
    assert short[0] == t.info.bos_id and short[-1] == t.info.eos_id


def test_chat_template_parses(tok_dir):
    """The eval/demo prompt ('<s> ' literal prefix) round-trips through a
    real tokenizer: bos from the text, assistant id present."""
    t = HFTokenizer(tok_dir, use_fast=True)
    prompt = ("<s> <|system|>\nhello<|end|>\n<|user|>\n<image>\n"
              "What color is the sky?<|end|>\n<|assistant|>\n")
    ids = t.encode(prompt)
    assert ids[0] == t.info.bos_id
    assert t.info.media_id in ids
    assert t.info.assistant_id in ids and t.info.assistant_id >= 0
    # decode drops specials
    text = t.decode(ids)
    assert "<image>" not in text and "sky" in text
