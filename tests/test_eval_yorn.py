"""MME/POPE harness tests: loader, byte-exact prompts, official scoring
rules, and the attn-mode ablation reaching the engine (VERDICT r3
missing #3 — BASELINE config #3's verification surface)."""

import base64
import io
import json

import numpy as np
import pytest

from aki_tpu.infer.eval_yorn import (
    load_records, mme_parse_pred, pope_parse_pred, render_prompt,
    score_mme, score_pope,
)


def test_render_prompt_golden():
    from aki_tpu.data.sft.templates import SYSTEM_MESSAGE

    q = "Is there a dog in the image? Please answer yes or no."
    want = (
        f"<s> <|system|>\n{SYSTEM_MESSAGE}<|end|>\n"
        f"<|user|>\n<image>\n{q}<|end|>\n<|assistant|>\n"
    )
    assert render_prompt(q) == want
    # question text is passed through verbatim — no added instruction
    assert "single word" not in render_prompt("plain?")


def test_mme_parse_pred_official_rule():
    # exact
    assert mme_parse_pred("Yes") == "yes"
    assert mme_parse_pred(" no ") == "no"
    # prefix window of 4 chars
    assert mme_parse_pred("yes, it is") == "yes"
    assert mme_parse_pred("no. the image shows") == "no"
    assert mme_parse_pred("Nope") == "no"          # "no" in "nope"[:4]
    assert mme_parse_pred("maybe yes") == "other"  # outside the window
    assert mme_parse_pred("unclear") == "other"


def test_pope_parse_pred_official_rule():
    assert pope_parse_pred("No") == "no"
    assert pope_parse_pred("There is not a dog.") == "no"
    # only the text before the first period counts
    assert pope_parse_pred("Yes. No doubt about it") == "yes"
    assert pope_parse_pred("it is, no,") == "no"   # commas stripped
    # "yes" is the fallback class (official rule)
    assert pope_parse_pred("absolutely") == "yes"
    assert pope_parse_pred("nothing") == "yes"     # word-level, not substr


def _mme_fixture():
    # one category, 2 images x 2 questions; second category partial
    recs = [
        {"image_key": "a.jpg", "answer": "Yes", "category": "existence",
         "question": "", "index": 0},
        {"image_key": "a.jpg", "answer": "No", "category": "existence",
         "question": "", "index": 1},
        {"image_key": "b.jpg", "answer": "Yes", "category": "existence",
         "question": "", "index": 2},
        {"image_key": "b.jpg", "answer": "No", "category": "existence",
         "question": "", "index": 3},
        {"image_key": "c.jpg", "answer": "Yes", "category": "code_reasoning",
         "question": "", "index": 4},
        {"image_key": "c.jpg", "answer": "No", "category": "code_reasoning",
         "question": "", "index": 5},
    ]
    return recs


def test_score_mme_acc_and_acc_plus():
    recs = _mme_fixture()
    # image a: both right; image b: one right; c: both right
    preds = ["yes", "no", "yes", "yes", "Yes", "no it is not"]
    rep = score_mme(recs, preds)
    ex = rep["categories"]["existence"]
    assert ex["n"] == 4
    assert ex["acc"] == pytest.approx(75.0)        # 3/4 questions
    assert ex["acc_plus"] == pytest.approx(50.0)   # 1/2 images fully right
    assert ex["score"] == pytest.approx(125.0)
    cg = rep["categories"]["code_reasoning"]
    assert cg["score"] == pytest.approx(200.0)     # perfect: 100 + 100
    assert rep["perception"] == pytest.approx(125.0)
    assert rep["cognition"] == pytest.approx(200.0)


def test_score_mme_other_counts_wrong():
    recs = _mme_fixture()[:2]
    rep = score_mme(recs, ["unclear", "no"])
    ex = rep["categories"]["existence"]
    assert ex["acc"] == pytest.approx(50.0)
    assert ex["acc_plus"] == pytest.approx(0.0)


def test_score_pope_metrics():
    recs = [
        {"answer": "yes", "category": "adversarial"},
        {"answer": "yes", "category": "adversarial"},
        {"answer": "no", "category": "adversarial"},
        {"answer": "no", "category": "popular"},
    ]
    # tp=1 (yes/yes), fn=1 (yes/no), fp=1 (no/yes), tn=1 (no/no)
    preds = ["Yes", "No", "Yes", "Not at all"]
    rep = score_pope(recs, preds)
    ov = rep["overall"]
    assert ov["accuracy"] == pytest.approx(50.0)
    assert ov["precision"] == pytest.approx(50.0)
    assert ov["recall"] == pytest.approx(50.0)
    assert ov["f1"] == pytest.approx(50.0)
    assert ov["yes_ratio"] == pytest.approx(50.0)
    assert set(rep["categories"]) == {"adversarial", "popular"}
    # the popular pair is gold=no/pred=no — a true negative
    assert rep["categories"]["popular"]["accuracy"] == pytest.approx(100.0)
    assert rep["categories"]["popular"]["f1"] == pytest.approx(0.0)
    assert rep["categories"]["adversarial"]["accuracy"] == pytest.approx(
        100.0 / 3)


def _png_b64():
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (32, 32), (200, 30, 40)).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_load_records_tsv_and_jsonl(tmp_path):
    b64 = _png_b64()
    tsv = tmp_path / "mme.tsv"
    tsv.write_text(
        "index\timage\timage_path\tquestion\tanswer\tcategory\n"
        f"0\t{b64}\timgs/a.jpg\tIs it red? Please answer yes or no.\tYes\tcolor\n"
        f"1\t{b64}\timgs/a.jpg\tIs it blue? Please answer yes or no.\tNo\tcolor\n"
    )
    recs = load_records(str(tsv), image_root="/data")
    assert len(recs) == 2
    assert recs[0]["image_path"] == "/data/imgs/a.jpg"
    assert recs[0]["image_key"] == recs[1]["image_key"] == "imgs/a.jpg"
    assert recs[0]["answer"] == "Yes"

    jl = tmp_path / "pope.jsonl"
    jl.write_text(json.dumps({
        "index": 0, "image": b64, "question": "Is there a dog?",
        "answer": "no", "category": "adversarial",
    }) + "\n")
    recs = load_records(str(jl))
    assert recs[0]["image_b64"] == b64
    from aki_tpu.infer.eval_yorn import record_pixels

    img = record_pixels(recs[0])
    assert img.size == (32, 32)


def test_yorn_cli_end_to_end_with_attn_modes(tmp_path):
    """Full CLI at tiny geometry: TSV -> bucketed generation -> official
    scoring, under each ablation mode (the flag must reach prefill —
    distinct modes must produce a report, and the engine-level ablation
    distinctness is pinned by tests/test_ablations.py)."""
    from aki_tpu.infer.eval_yorn import main

    b64 = _png_b64()
    tsv = tmp_path / "pope.tsv"
    rows = ["index\timage\tquestion\tanswer\tcategory"]
    for i in range(3):
        rows.append(f"{i}\t{b64}\tIs there a thing {i}? Please answer "
                    f"yes or no.\t{'yes' if i % 2 else 'no'}\tpopular")
    tsv.write_text("\n".join(rows) + "\n")

    for mode in ("causal", None):
        out = tmp_path / f"out_{mode}"
        argv = ["--benchmark", "pope", "--data", str(tsv), "--tiny",
                "--batch", "2", "--max-new-tokens", "2",
                "--out", str(out), "--no-warmup"]
        if mode:
            argv += ["--attn-mode", mode]
        main(argv)
        rep = json.loads((out / "report.json").read_text())
        assert "overall" in rep and rep["overall"]["n"] == 3
        preds = (out / "predictions.jsonl").read_text().splitlines()
        assert len(preds) == 3


def test_attn_mode_reaches_generate():
    """generate(attn_mode=...) produces distinct logprob paths: causal vs
    mma differ, dot maps to text_first order (invariance pinned against
    the explicit order kwarg)."""
    import jax
    import jax.numpy as jnp
    from aki_tpu.infer.engine import generate
    from aki_tpu.models.aki import init_aki
    from aki_tpu.models.common import F32
    from aki_tpu.models.configs import aki_tiny

    cfg = aki_tiny()
    params = init_aki(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    b, t = 1, 12
    ids = rng.randint(5, cfg.initial_tokenizer_len - 1, size=(b, t))
    ids[:, 1] = cfg.media_token_id
    ids[:, 8] = cfg.assistant_token_id
    s = cfg.siglip.image_size
    imgs = jnp.asarray(rng.randn(b, s, s, 3).astype(np.float32))
    valid = jnp.ones((b, t), jnp.int32)

    def toks(**kw):
        out, _ = generate(params, cfg, jnp.asarray(ids), imgs, valid,
                          max_new_tokens=4, max_len=64, policy=F32,
                          use_flash=False, **kw)
        return np.asarray(out).tolist()

    t_mma = toks(attn_mode="mma")
    t_dot = toks(attn_mode="dot")
    t_dot_order = toks(order="text_first")
    assert t_dot == t_dot_order          # dot == explicit text_first
    assert t_mma == toks()               # mma == default
    # causal must run (distinctness of logits pinned in test_ablations)
    toks(attn_mode="causal")
