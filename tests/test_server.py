"""Continuous-batching serving engine: correctness vs the one-shot engine."""

import numpy as np
import jax
import jax.numpy as jnp

from aki_tpu.infer.engine import generate
from aki_tpu.infer.server import ServingEngine
from aki_tpu.models.aki import init_aki
from aki_tpu.models.common import F32
from aki_tpu.models.configs import aki_tiny

CFG = aki_tiny()


def make_prompt(rng, t=12):
    ids = rng.randint(5, CFG.initial_tokenizer_len - 1, size=(t,))
    ids[1] = CFG.media_token_id
    ids[8] = CFG.assistant_token_id
    s = CFG.siglip.image_size
    img = rng.randn(s, s, 3).astype(np.float32)
    return list(ids), img


def test_server_matches_one_shot_greedy():
    rng = np.random.RandomState(0)
    params = init_aki(jax.random.PRNGKey(0), CFG)
    engine = ServingEngine(params, CFG, num_slots=2, max_len=48,
                           prompt_bucket=12, policy=F32)

    reqs = []
    prompts = []
    for i in range(4):  # more requests than slots -> slot reuse
        ids, img = make_prompt(np.random.RandomState(100 + i))
        prompts.append((ids, img))
        reqs.append(engine.submit(ids, img, max_new_tokens=5))
    engine.run_until_drained()

    for (ids, img), req in zip(prompts, reqs):
        got = req.result(timeout=1)
        want, _ = generate(
            params, CFG, jnp.array([ids], jnp.int32), jnp.array(img[None]),
            jnp.ones((1, len(ids)), jnp.int32), max_new_tokens=5, max_len=48,
            policy=F32, use_flash=False,
        )
        assert got == list(np.asarray(want)[0]), (got, np.asarray(want)[0])


def test_server_kv_int8_matches_one_shot():
    """The memory-capacity mode: int8 slot cache through the full server
    loop (admission scatter of the 4-buffer cache + fused decode)."""
    params = init_aki(jax.random.PRNGKey(0), CFG)
    engine = ServingEngine(params, CFG, num_slots=2, max_len=48,
                           prompt_bucket=12, policy=F32, kv_int8=True)
    reqs, prompts = [], []
    for i in range(3):
        ids, img = make_prompt(np.random.RandomState(200 + i))
        prompts.append((ids, img))
        reqs.append(engine.submit(ids, img, max_new_tokens=4))
    engine.run_until_drained()
    for (ids, img), req in zip(prompts, reqs):
        got = req.result(timeout=1)
        want, _ = generate(
            params, CFG, jnp.array([ids], jnp.int32), jnp.array(img[None]),
            jnp.ones((1, len(ids)), jnp.int32), max_new_tokens=4, max_len=48,
            policy=F32, use_flash=False, kv_int8=True,
        )
        assert got == list(np.asarray(want)[0]), (got, np.asarray(want)[0])


def test_server_uint8_ingress_matches_float():
    """uint8 ingress (device-side normalize) must produce the same tokens
    as pre-normalized float32 ingress of the same pixels."""
    params = init_aki(jax.random.PRNGKey(0), CFG)
    s = CFG.siglip.image_size
    rng = np.random.RandomState(3)
    prompts = []
    for i in range(3):
        ids, _ = make_prompt(np.random.RandomState(300 + i))
        px = rng.randint(0, 256, (s, s, 3)).astype(np.uint8)
        prompts.append((ids, px))

    eng_u8 = ServingEngine(params, CFG, num_slots=2, max_len=48,
                           prompt_bucket=12, policy=F32, image_uint8=True)
    reqs_u8 = [eng_u8.submit(ids, px, max_new_tokens=4)
               for ids, px in prompts]
    eng_u8.run_until_drained()

    eng_f = ServingEngine(params, CFG, num_slots=2, max_len=48,
                          prompt_bucket=12, policy=F32)
    reqs_f = [
        eng_f.submit(
            ids, (px.astype(np.float32) / 255.0 - 0.5) / 0.5,  # images.py:30
            max_new_tokens=4,
        )
        for ids, px in prompts
    ]
    eng_f.run_until_drained()

    for ru, rf in zip(reqs_u8, reqs_f):
        assert ru.result(timeout=1) == rf.result(timeout=1)


import pytest


@pytest.mark.parametrize("kv_int8", [False, True])
def test_server_compact_tail_matches_one_shot(kv_int8):
    """Tail compaction: staggered budgets force the drain tail through the
    move-to-front + live-width path (4 slots -> live 2 -> live 1), a
    second wave forces re-expansion to the full slot pool, and every token
    must still match the one-shot engine. kv_int8=True exercises the q8
    XLA decode's fused batch-prefix cache read (the production config);
    kv_int8=False covers the ignore-the-hint bf16 path."""
    params = init_aki(jax.random.PRNGKey(0), CFG)
    engine = ServingEngine(params, CFG, num_slots=4, max_len=48,
                           prompt_bucket=12, policy=F32, decode_chunk=2,
                           compact_tail=True, kv_int8=kv_int8)
    assert engine._compact_widths == [1, 2]

    def wave(seed0, budgets):
        reqs, prompts = [], []
        for i, m in enumerate(budgets):
            ids, img = make_prompt(np.random.RandomState(seed0 + i))
            prompts.append((ids, img, m))
            reqs.append(engine.submit(ids, img, max_new_tokens=m))
        engine.run_until_drained()
        return reqs, prompts

    # staggered budgets: after the chunk-2 ticks complete the short ones,
    # occupancy falls 4 -> 2 -> 1 and the trigger compacts
    reqs, prompts = wave(300, [2, 2, 6, 10])
    assert engine._live == 1       # tail ended fully compacted
    # second wave while compacted: admission must expand back to 4 slots
    # (free — buffers never shrink) and then compact its own tail
    reqs2, prompts2 = wave(310, [3, 3, 3, 3])
    assert engine._live in (4, *engine._compact_widths)

    for (ids, img, m), req in zip(prompts + prompts2, reqs + reqs2):
        got = req.result(timeout=1)
        want, _ = generate(
            params, CFG, jnp.array([ids], jnp.int32), jnp.array(img[None]),
            jnp.ones((1, len(ids)), jnp.int32), max_new_tokens=m,
            max_len=48, policy=F32, use_flash=False, kv_int8=kv_int8,
        )
        assert got == list(np.asarray(want)[0]), (got, np.asarray(want)[0])


def test_server_eos_frees_slot_early():
    rng = np.random.RandomState(1)
    params = init_aki(jax.random.PRNGKey(1), CFG)
    engine = ServingEngine(params, CFG, num_slots=1, max_len=48,
                           prompt_bucket=12, policy=F32)
    ids, img = make_prompt(rng)
    # find the first greedy token and use it as eos
    want, _ = generate(
        params, CFG, jnp.array([ids], jnp.int32), jnp.array(img[None]),
        jnp.ones((1, len(ids)), jnp.int32), max_new_tokens=1, max_len=48,
        policy=F32, use_flash=False,
    )
    eos = int(np.asarray(want)[0][0])
    r1 = engine.submit(ids, img, max_new_tokens=8, eos_id=eos)
    ids2, img2 = make_prompt(np.random.RandomState(7))
    r2 = engine.submit(ids2, img2, max_new_tokens=3)
    engine.run_until_drained()
    assert r1.result(timeout=1) == []     # stopped at eos immediately
    assert len(r2.result(timeout=1)) == 3
    # early slot free: r2 refills r1's slot at a chunk boundary, so the
    # drain is a handful of decode chunks — NOT 8+3 sequential steps.
    # (Counts dispatches, not scheduler ticks: run_until_drained's tick
    # count includes idle ticks waiting on the uploader thread, which
    # scales with host load — observed 8..32 for the same drain.)
    assert engine.decode_dispatches <= 4, engine.decode_dispatches


def test_predict_cli_end_to_end(tmp_path):
    """JSONL in -> continuous-batching server -> JSONL out (the external
    eval-harness adapter surface)."""
    import json

    from PIL import Image

    from aki_tpu.infer.predict import main

    img = tmp_path / "x.jpg"
    Image.new("RGB", (64, 64), (120, 30, 40)).save(img)
    reqs = [{"image": str(img), "question": f"what is item {i}?", "id": i}
            for i in range(3)]
    inp = tmp_path / "in.jsonl"
    inp.write_text("\n".join(json.dumps(r) for r in reqs))
    out = tmp_path / "out.jsonl"

    main(["--tiny", "--input", str(inp), "--output", str(out),
          "--slots", "2", "--max-new-tokens", "3", "--max-len", "96",
          "--prompt-bucket", "64"])
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(lines) == 3
    assert {l["id"] for l in lines} == {0, 1, 2}
    assert all(isinstance(l["answer"], str) for l in lines)


def test_server_bucketed_windowed_admission():
    """Mixed-length prompts with two buckets + windowed shortest-first
    admission: every request still gets the one-shot greedy answer, and
    short-prompt batches run the smaller prefill bucket."""
    params = init_aki(jax.random.PRNGKey(0), CFG)
    engine = ServingEngine(
        params, CFG, num_slots=2, max_len=48,
        prompt_bucket=16, prompt_buckets=(12, 16),
        admit_batch=2, admit_policy="batched", policy=F32,
    )

    reqs, prompts = [], []
    for i in range(6):
        t = 10 if i % 2 == 0 else 15  # alternate short/long
        ids, img = make_prompt(np.random.RandomState(300 + i), t=t)
        prompts.append((ids, img))
        reqs.append(engine.submit(ids, img, max_new_tokens=4))
    engine.run_until_drained()

    for (ids, img), req in zip(prompts, reqs):
        got = req.result(timeout=1)
        want, _ = generate(
            params, CFG, jnp.array([ids], jnp.int32), jnp.array(img[None]),
            jnp.ones((1, len(ids)), jnp.int32), max_new_tokens=4, max_len=48,
            policy=F32, use_flash=False,
        )
        assert got == list(np.asarray(want)[0]), (got, np.asarray(want)[0])


def test_server_windowed_admission_no_starvation():
    """A long prompt at head-of-line among a stream of short prompts must
    be force-admitted after one skip (anti-starvation guard)."""
    params = init_aki(jax.random.PRNGKey(0), CFG)
    engine = ServingEngine(
        params, CFG, num_slots=2, max_len=48,
        prompt_bucket=16, prompt_buckets=(12, 16),
        admit_batch=2, admit_policy="batched", policy=F32,
    )
    # head is LONG; everything after is short
    lengths = [15] + [10] * 7
    reqs = []
    for i, t in enumerate(lengths):
        ids, img = make_prompt(np.random.RandomState(400 + i), t=t)
        reqs.append(engine.submit(ids, img, max_new_tokens=3))
    engine.run_until_drained()
    for req in reqs:
        assert len(req.result(timeout=1)) > 0  # everyone completed


def test_fused_admission_matches_split_insert():
    """The fused admission prefill (K/V scattered straight into the
    donated slot cache, `prefill(slot_state=..., slots=...)`) must produce
    a state identical to the split oracle (batch-sized prefill + `_insert`
    scatter) — on fresh engines, where both leave untouched rows zero.
    Covers live rows, a dropped pad row (slot index == num_slots), and
    both cache dtypes."""
    from aki_tpu.infer.engine import prefill

    params = init_aki(jax.random.PRNGKey(0), CFG)
    for kv8 in (False, True):
        eng_a = ServingEngine(params, CFG, num_slots=3, max_len=48,
                              prompt_bucket=12, policy=F32, kv_int8=kv8)
        eng_b = ServingEngine(params, CFG, num_slots=3, max_len=48,
                              prompt_bucket=12, policy=F32, kv_int8=kv8)
        rng = np.random.RandomState(7)
        ids = np.stack([make_prompt(rng)[0] for _ in range(2)]).astype(np.int32)
        imgs = np.stack([make_prompt(rng)[1] for _ in range(2)])
        valid = np.ones((2, 12), np.int32)
        slots = jnp.array([2, 3], jnp.int32)  # row 1 drops (== num_slots)

        eng_a.state = eng_a._prefill_batch(
            params, jnp.array(ids), jnp.array(imgs), jnp.array(valid),
            eng_a.state, slots,
        )
        new = prefill(params, CFG, jnp.array(ids), jnp.array(imgs),
                      jnp.array(valid), max_len=48, policy=F32,
                      kv_int8=kv8)
        eng_b.state = eng_b._insert(eng_b.state, new, slots)

        la, lb = jax.tree.leaves(eng_a.state), jax.tree.leaves(eng_b.state)
        for xa, xb in zip(la, lb):
            if np.issubdtype(np.asarray(xa).dtype, np.integer):
                np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
            else:
                # two distinct XLA programs (fused vs split) round float
                # intermediates differently — observed max 1e-7
                np.testing.assert_allclose(
                    np.asarray(xa, np.float32), np.asarray(xb, np.float32),
                    rtol=1e-5, atol=1e-5,
                )


def test_server_drain_does_not_burn_max_steps_while_uploads_pending():
    """Regression: on a small host the drain loop used to HOT-SPIN while
    requests sat admission-held in ``_ready`` waiting for the uploader —
    each empty tick counted against ``max_steps``, so a slow transfer made
    ``run_until_drained`` burn its whole budget in seconds and silently
    return with unfulfilled handles (observed on the 1-core bench host).
    Idle ticks must sleep and must NOT count against max_steps."""
    import time

    params = init_aki(jax.random.PRNGKey(0), CFG)
    engine = ServingEngine(params, CFG, num_slots=4, max_len=48,
                           prompt_bucket=12, policy=F32,
                           admit_batch=4, admit_policy="batched",
                           upload_chunk=2)
    orig_put = engine._put

    def slow_put(x):
        time.sleep(0.12)   # a slow tunnel transfer
        return orig_put(x)

    engine._put = slow_put
    reqs = []
    for i in range(8):
        ids, img = make_prompt(np.random.RandomState(300 + i))
        reqs.append(engine.submit(ids, img, max_new_tokens=3))
    # before the fix the hot spin exhausted this budget during the first
    # 120 ms transfer alone; after it, idle ticks sleep and don't count
    steps = engine.run_until_drained(max_steps=500)
    for r in reqs:
        assert r.result(timeout=1) is not None
    assert steps < 500
