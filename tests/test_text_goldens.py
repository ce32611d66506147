"""String-level goldens: our data-layer text construction must be
byte-identical to the reference f-strings (train/data.py:77-94, 185-197),
because any whitespace difference changes the SentencePiece token stream
the checkpoint was trained on."""

import json
from ast import literal_eval

import numpy as np

from aki_tpu.data.pretrain import caption_text, parse_caption
from aki_tpu.data.tokenizer import HashTokenizer


def reference_paired_text(s: str, dataset_name: str) -> str:
    """Verbatim transcription of data.py:77-94 (one sample)."""
    if dataset_name in ("cc3m", "cc12m", "blip3_kale"):
        return f"<image>{s.strip()}<|endofchunk|>"
    if dataset_name == "blip3_grounding_50m":
        return f"<image>{literal_eval(s)[0][0].strip()}<|endofchunk|>"
    if dataset_name == "blip3_ocr_200m":
        return f"<image>{json.loads(s)[1]['text'].strip()}<|endofchunk|>"
    raise NotImplementedError


def ours_paired_text(raw: str, dataset_name: str) -> str:
    cap = parse_caption({"txt": raw.encode()}, dataset_name)
    assert cap is not None
    return caption_text(cap)


def test_paired_text_byte_equal():
    cases = [
        ("  A photo of a cat on a mat.\n", "blip3_kale"),
        ("plain caption", "cc3m"),
        (repr([[" a dog by a tree ", 0, False], ["finer", 2, True]]),
         "blip3_grounding_50m"),
        (json.dumps([{"meta": 1}, {"text": "  OCR text line  "}]),
         "blip3_ocr_200m"),
    ]
    for raw, name in cases:
        assert ours_paired_text(raw, name) == reference_paired_text(raw, name)


def reference_interleaved_text(sentences: list[str], sentence_ixs) -> str:
    """Verbatim transcription of data.py:185-197 (text construction only,
    eos appended by the tokenizer in our path)."""
    sentences = list(sentences)
    for ix in sentence_ixs:
        sentences[ix] = f"<|endofchunk|><image>{sentences[ix]}"
    text = " ".join(sentences)
    text = text.replace("<|endofchunk|>", "", 1)
    text = (
        text.replace(" <|endofchunk|>", "<|endofchunk|>")
        .replace("<image> ", "<image>")
        .replace(" <image>", "<image>")
    )
    return f"{text}<|endofchunk|>"


def test_interleaved_text_byte_equal():
    # drive preprocess_interleaved and compare its token stream against
    # tokenizing the reference-constructed string
    import base64
    import io

    from PIL import Image

    from aki_tpu.data.interleaved import InterleavedConfig, preprocess_interleaved

    tok = HashTokenizer()
    sents = ["First sentence here.", "Second one.", "Third sentence."]
    n_img = 2
    sim = np.full((n_img, len(sents)), 0.01)
    sim[0, 1] = 0.9
    sim[1, 2] = 0.85

    def b64():
        img = Image.new("RGB", (64, 64), (10, 20, 30))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        data = buf.getvalue() + b"\0" * 12_000
        return base64.b64encode(data).decode()

    info = {
        "text_list": sents,
        "similarity_matrix": sim.tolist(),
        "image_info": [{"image_base64": b64()} for _ in range(n_img)],
    }
    cfg = InterleavedConfig(shards="x", image_size=28, max_tokens=128)
    _, ids = preprocess_interleaved(info, tok, cfg, np.random.RandomState(0))

    # reference appends {eos_token} to the text, then the tokenizer (with
    # add_bos/add_eos True) brackets with bos/eos -> double eos at the end
    golden = reference_interleaved_text(sents, [1, 2])
    eos = tok.info.eos_id
    body = tok.encode(golden) + [eos]
    want = [tok.info.bos_id] + body[: cfg.max_tokens - 2] + [eos]
    assert ids == want


def test_hash_tokenizer_splits_specials_without_spaces():
    tok = HashTokenizer()
    ids = tok.encode("<image>cat<|endofchunk|>")
    assert ids[0] == tok.info.media_id
    assert ids[-1] == tok.info.end_of_chunk_id
    assert len(ids) == 3
    # identical word id with or without adjacent specials
    assert tok.encode("cat") == [ids[1]]
