"""SFT data layer: templates, label masking, parsers, mixture, collate."""

import json
import random

import numpy as np
import pytest

from aki_tpu.data.sft.parsers import (
    cluster_records, format_bbox, idx2option, optionize, parse_llava,
    parse_scienceqa, parse_vsr, PARSERS,
)
from aki_tpu.data.sft.pipeline import (
    MultiDataset, SFTDataset, batches, collate, SFTSample, worker_seed,
)
from aki_tpu.data.sft.templates import (
    AI, END, HUMAN, IGNORE_INDEX, SYSTEM_MESSAGE_ROLE, Template,
)
from aki_tpu.data.sft.templatizer import Templatizer, templatize
from aki_tpu.data.tokenizer import HashTokenizer


def test_templatize_single_turn_layout():
    pattern = ("", "Answer the question using a single word or phrase. {question}",
               "{answer}")
    text = templatize(pattern, [{"question": "What color?", "answer": "red"}])
    want = (
        f"{SYSTEM_MESSAGE_ROLE}\n"
        f"{HUMAN}<image>\n"
        f"Answer the question using a single word or phrase. What color?{END}\n"
        f"{AI}red"
    )
    assert text == want


def test_templatize_no_image():
    pattern = ("", "{question}", "{answer}")
    text = templatize(pattern, [{"question": "Q", "answer": "A"}],
                      image_prompt=None)
    assert "<image>" not in text
    assert f"{HUMAN}Q{END}\n{AI}A" in text


def test_template_registry_lookup():
    t = Template.get("default")
    assert t.get_pattern("vqa")[0][2] == "{answer}"
    assert t.get_pattern("aokvqa") == t.pattern_dict["vqa-o"]
    assert t.get_pattern("nonexistent") is None


def test_label_masking_through_assistant(tmp_path):
    tok = HashTokenizer()
    # LLaVA-format record
    ann = [{
        "id": "1", "image": "img.jpg",
        "conversations": [
            {"from": "human", "value": "<image>\nWhat is it?"},
            {"from": "gpt", "value": "a cat"},
        ],
    }]
    p = tmp_path / "llava.json"
    p.write_text(json.dumps(ann))
    from PIL import Image
    Image.new("RGB", (32, 32), (120, 30, 200)).save(tmp_path / "img.jpg")

    ds = SFTDataset(
        "LLaVAInstructDataset",
        {"data_path": str(p), "image_path": str(tmp_path)},
        tok, max_length=128, image_size=28, rng=random.Random(0),
    )
    s = ds.sample(0)
    asst = tok.info.assistant_id
    idx = s.input_ids.index(asst)
    assert all(l == IGNORE_INDEX for l in s.labels[: idx + 1])
    assert s.labels[idx + 1:] == s.input_ids[idx + 1:]
    assert s.image is not None and s.image.shape == (28, 28, 3)


def test_optionize_deterministic_no_shuffle():
    opt, ans = optionize(["x", "y", "z"], 1, shuffle=False)
    assert opt == "A. x\nB. y\nC. z"
    assert ans == "B"
    # shuffled: answer letter must track the answer string
    rng = random.Random(3)
    opt, ans = optionize(["x", "y", "z"], 1, rng=rng)
    lines = opt.split("\n")
    letter = ans
    target = [l for l in lines if l.startswith(f"{letter}.")][0]
    assert target.endswith("y")


def test_bbox_format():
    s = format_bbox(10, 20, 30, 40, 100, 200, coord_style=3)
    assert s == "<bbox>[0.100, 0.100][0.400, 0.300]</bbox>"
    s2 = format_bbox(10, 20, 30, 40, 100, 200, coord_style=2)
    assert s2 == "<bbox>[0.10, 0.10][0.40, 0.30]</bbox>"


def test_idx2option():
    assert idx2option(0) == "A."
    assert idx2option(2, "num", "paren") == "(3)"
    assert idx2option(1, "lower", "rparen") == "b)"


def test_vsr_interrogative_rewrite(tmp_path):
    ann = [{
        "image_link": "http://x/train2017/000001.jpg",
        "caption": "The cat is under the table.",
        "label": 1,
    }]
    p = tmp_path / "vsr.jsonl"
    p.write_text("\n".join(json.dumps(a) for a in ann))
    recs = parse_vsr(str(p), "/tr", "/va")
    ex = recs[0]["examples"][0]
    assert ex["answer"] == "yes"
    assert ex["question_interro"] == "Is the cat under the table?"
    assert recs[0]["image"] == "/tr/000001.jpg"


def test_scienceqa_parser_and_optionize(tmp_path):
    ann = {"1": {
        "question": "Which is north?", "choices": ["WV", "LA"],
        "answer": 0, "hint": "", "image": "image.png", "split": "train",
        "solution": "look at the map",
    }, "2": {
        "question": "skip me", "choices": ["a"], "answer": 0, "hint": "",
        "image": None, "split": "val", "solution": "",
    }}
    p = tmp_path / "sqa.json"
    p.write_text(json.dumps(ann))
    recs = parse_scienceqa(str(p), "/imgs")
    assert len(recs) == 1
    assert recs[0]["image"] == "/imgs/1/image.png"
    assert recs[0]["examples"][0]["context"] == "N/A"
    assert recs[0]["examples"][0]["_needs"] == "optionize"


def test_multidataset_weights_and_length(tmp_path):
    tok = HashTokenizer()

    def mk(name, n):
        ann = [{
            "id": str(i), "image": "unused.jpg",
            "conversations": [
                {"from": "human", "value": f"{name} q{i}"},
                {"from": "gpt", "value": f"a{i}"},
            ],
        } for i in range(n)]
        p = tmp_path / f"{name}.json"
        p.write_text(json.dumps(ann))
        ds = SFTDataset("LLaVAInstructDataset",
                        {"data_path": str(p), "image_path": str(tmp_path)},
                        tok, max_length=64, image_size=28)
        # patch records to be imageless (LLaVA parser always sets image)
        for r in ds.records:
            r.pop("image", None)
        return ds

    d1, d2 = mk("aa", 30), mk("bb", 10)
    mix = MultiDataset([d1, d2], sampling_weights=[3, 1], num_ranks=2, seed=0)
    assert len(mix) == 20
    samples = list(mix)
    assert len(samples) == 20

    batch = collate(samples[:4], tok.info.pad_id, max_length=64, image_size=28)
    assert batch.input_ids.shape == (4, 65)  # max_length + 1
    assert batch.images.shape == (4, 28, 28, 3)
    # imageless samples got zero images
    assert np.all(batch.images == 0)
    # pads are masked
    assert np.all(batch.labels[batch.attn_valid == 0] == IGNORE_INDEX)


def test_worker_seed_distinct():
    seeds = {worker_seed(0, r, w) for r in range(4) for w in range(4)}
    assert len(seeds) == 16


def test_parser_registry_complete():
    # all 9 reference dataset classes are available
    for name in ["LLaVAInstructDataset", "ScienceQADataset", "VQADataset",
                 "AOKVQADataset", "GQADataset", "OCRVQADataset", "VSRDataset",
                 "VGDataset", "RefExpLocDataset"]:
        assert name in PARSERS
