"""Differential tests against the reference implementation ITSELF.

Builds the reference ``AKI`` (``src/aki.py:9``) at tiny geometry on CPU
torch with the REAL token-id layout (vocab 32064, media 32011, assistant
32001 — the hardcode at ``vlm.py:492``), exports its ``state_dict()``
through ``convert_aki_checkpoint``, and asserts:

(i)  forward logits match ``aki_forward`` in fp32 — single-image,
     right-padded, and mixed media/no-media batches;
(ii) the loss over the reference's own spliced labels matches;
(iii) teacher-forced cached decode (``infer/engine``) matches the
      reference full re-forward step by step, and greedy tokens agree.

This pins the MMA mask (vlm.py:410-443), splice/label expansion
(vlm.py:445-603), decoupled vocab incl. the bias=True lm_head
(helpers.py:350-613), and the prefill->decode contract to the actual
reference code, not a re-derivation.

Environment shims (documented deviations, none touch reference logic):
- ``open_flamingo/__init__`` imports ``open_clip`` (not installed); the
  reference package is loaded as a synthetic package skipping __init__.
- ``einops_exts`` is not installed; ``rearrange_many`` is re-implemented
  (its public semantics: map ``rearrange`` over a tuple).
- the reference pins transformers==4.41.2, which *inverts* 4D 0/1
  attention masks into additive form inside
  ``_prepare_4d_causal_attention_mask``; installed 4.57 passes 4D masks
  through as-is, so a forward shim on ``lang_model`` reproduces the
  pinned inversion.
"""

import importlib
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from aki_tpu.convert.torch_to_jax import convert_aki_checkpoint
from aki_tpu.infer.engine import decode_step, prefill
from aki_tpu.models.aki import aki_forward
from aki_tpu.models.common import F32
from aki_tpu.models.configs import (
    AKIConfig, PerceiverConfig, Phi3Config, SigLIPVisionConfig,
)

REF = "/root/reference/codes/open_flamingo"

VOCAB = 32064
INITIAL = 32011        # len(tokenizer) before <image>/<|endofchunk|>
PAD = 32000
ASSISTANT = 32001      # hardcoded in vlm.py:492
MEDIA = 32011
EOC = 32012
N_VIS = 6
IMG = 28


def _load_ref_aki():
    if "einops_exts" not in sys.modules:
        from einops import rearrange

        ee = types.ModuleType("einops_exts")
        ee.rearrange_many = lambda xs, pattern, **kw: [
            rearrange(x, pattern, **kw) for x in xs
        ]
        sys.modules["einops_exts"] = ee
    if "refof" not in sys.modules:
        pkg = types.ModuleType("refof")
        pkg.__path__ = [REF]
        src = types.ModuleType("refof.src")
        src.__path__ = [REF + "/src"]
        sys.modules["refof"] = pkg
        sys.modules["refof.src"] = src
    return importlib.import_module("refof.src.aki")


def _shim_4d_mask_inversion(lang_model):
    """transformers==4.41.2 (reference pin) inverted 4D 0/1 masks into
    additive -inf form (modeling_attn_mask_utils._prepare_4d_causal_
    attention_mask); 4.57 passes 4D masks through. Reproduce the pin."""
    orig = lang_model.forward

    def fwd(*args, **kw):
        am = kw.get("attention_mask")
        if am is not None and am.dim() == 4:
            inv = 1.0 - am.float()
            kw["attention_mask"] = inv.masked_fill(
                inv.bool(), torch.finfo(torch.float32).min
            )
        return orig(*args, **kw)

    lang_model.forward = fwd


@pytest.fixture(scope="module")
def models():
    from transformers import Phi3Config as HFPhi3Config
    from transformers import SiglipVisionConfig as HFSiglipVisionConfig
    from transformers.models.phi3.modeling_phi3 import Phi3ForCausalLM
    from transformers.models.siglip.modeling_siglip import SiglipVisionModel

    ref_aki_mod = _load_ref_aki()
    torch.manual_seed(7)
    hf_phi = Phi3ForCausalLM(HFPhi3Config(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=4096, rope_theta=10000.0,
        sliding_window=None, pad_token_id=PAD, bos_token_id=1,
        eos_token_id=2, attn_implementation="eager",
    )).eval().float()
    hf_siglip = SiglipVisionModel(HFSiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=IMG, patch_size=14,
    )).eval().float()

    ref = ref_aki_mod.AKI(
        vision_encoder=hf_siglip.vision_model,   # factory.py:74-77 unwraps
        lang_model=hf_phi,
        vis_feature_dim=32,
        initial_tokenizer_len=INITIAL,
        pad_token_id=PAD,
        decoder_layers_attr_name="model.layers",
        num_vision_tokens=N_VIS,
    )
    ref.set_special_token_ids({"<image>": MEDIA, "<|endofchunk|>": EOC})
    ref = ref.eval().float()
    _shim_4d_mask_inversion(ref.lang_model)

    cfg = AKIConfig(
        phi3=Phi3Config(
            vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=2, num_kv_heads=2, head_dim=16,
            max_position_embeddings=4096,
            original_max_position_embeddings=4096,
        ),
        siglip=SigLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_layers=2,
            num_heads=2, image_size=IMG, patch_size=14,
        ),
        perceiver=PerceiverConfig(
            dim=32, dim_inner=32, depth=6, dim_head=64, heads=8,
            num_latents=N_VIS, ff_mult=4,
        ),
        initial_tokenizer_len=INITIAL,
        num_extra_tokens=2,
        pad_token_id=PAD,
        media_token_id=MEDIA,
        end_of_chunk_token_id=EOC,
        assistant_token_id=ASSISTANT,
    )
    params = convert_aki_checkpoint(
        {k: v for k, v in ref.state_dict().items()}, cfg
    )
    params = jax.tree.map(jnp.asarray, params)
    return ref, cfg, params


def _rand_prompt(rng, t, media_pos, assistant_pos=None, n_pad=0):
    ids = rng.randint(3, 31000, size=(t,))
    ids[media_pos] = MEDIA
    if assistant_pos is not None:
        ids[assistant_pos] = ASSISTANT
    valid = np.ones(t, np.int64)
    if n_pad:
        ids[t - n_pad:] = PAD
        valid[t - n_pad:] = 0
    return ids, valid


def _ref_forward(ref, ids, valid, pixels_nchw, labels=None):
    vision_x = None
    if pixels_nchw is not None:
        vision_x = torch.tensor(pixels_nchw)[:, None, None]  # (B,1,1,C,H,W)
    with torch.no_grad():
        out = ref(
            vision_x=vision_x,
            lang_x=torch.tensor(ids),
            attention_mask=torch.tensor(valid),
            labels=None if labels is None else torch.tensor(labels),
        )
    return out


def _assert_logits_match(ref_logits, our_logits, row_lengths, tol=2e-4):
    ref_logits = ref_logits.float().numpy()
    ours = np.asarray(our_logits)
    assert ref_logits.shape == ours.shape, (ref_logits.shape, ours.shape)
    for i, n in enumerate(row_lengths):
        np.testing.assert_allclose(
            ours[i, :n], ref_logits[i, :n], rtol=tol, atol=tol,
            err_msg=f"row {i}",
        )


def test_forward_logits_single_image_batch(models):
    ref, cfg, params = models
    rng = np.random.RandomState(0)
    b, t = 2, 12
    rows = [_rand_prompt(rng, t, media_pos=1, assistant_pos=7),
            _rand_prompt(rng, t, media_pos=2, assistant_pos=8)]
    ids = np.stack([r[0] for r in rows])
    valid = np.stack([r[1] for r in rows])
    pixels = rng.randn(b, 3, IMG, IMG).astype(np.float32)

    out = _ref_forward(ref, ids, valid, pixels)
    ours = aki_forward(
        params, cfg, jnp.asarray(ids, jnp.int32),
        jnp.asarray(pixels.transpose(0, 2, 3, 1)),
        jnp.asarray(valid, jnp.int32), policy=F32, use_flash=False,
    )
    t_full = t + N_VIS - 1
    _assert_logits_match(out.logits, ours.logits, [t_full, t_full])


def test_forward_logits_right_padded_batch(models):
    ref, cfg, params = models
    rng = np.random.RandomState(1)
    b, t = 2, 14
    rows = [_rand_prompt(rng, t, media_pos=1, assistant_pos=6, n_pad=0),
            _rand_prompt(rng, t, media_pos=1, assistant_pos=5, n_pad=4)]
    ids = np.stack([r[0] for r in rows])
    valid = np.stack([r[1] for r in rows])
    pixels = rng.randn(b, 3, IMG, IMG).astype(np.float32)

    out = _ref_forward(ref, ids, valid, pixels)
    ours = aki_forward(
        params, cfg, jnp.asarray(ids, jnp.int32),
        jnp.asarray(pixels.transpose(0, 2, 3, 1)),
        jnp.asarray(valid, jnp.int32), policy=F32, use_flash=False,
    )
    t_full = t + N_VIS - 1
    _assert_logits_match(out.logits, ours.logits,
                         [t_full, t_full - 4])


def test_loss_matches_reference_label_expansion(models):
    """CE over the reference's own spliced labels == our loss."""
    ref, cfg, params = models
    rng = np.random.RandomState(2)
    b, t = 2, 12
    rows = [_rand_prompt(rng, t, media_pos=1, assistant_pos=5),
            _rand_prompt(rng, t, media_pos=3, assistant_pos=7, n_pad=2)]
    ids = np.stack([r[0] for r in rows])
    valid = np.stack([r[1] for r in rows])
    labels = np.where(valid == 1, ids, -100)
    labels[:, :6] = -100  # prompt-mask a prefix
    pixels = rng.randn(b, 3, IMG, IMG).astype(np.float32)

    # reference spliced labels via its own _prepare_inputs_for_forward
    with torch.no_grad():
        vision_x = torch.tensor(pixels)[:, None, None]
        vt = ref.vision_tokenizer(ref._encode_vision_x(vision_x=vision_x))
        new_inputs = ref._prepare_inputs_for_forward(
            vision_tokens=vt, lang_x=torch.tensor(ids),
            attention_mask=torch.tensor(valid),
            labels=torch.tensor(labels), padding_side="right",
        )
        out = ref.lang_model(
            inputs_embeds=new_inputs["inputs_embeds"],
            attention_mask=new_inputs["attention_mask"],
        )
        ref_labels = new_inputs["labels"]
        shift_logits = out.logits[:, :-1].reshape(-1, out.logits.shape[-1])
        shift_labels = ref_labels[:, 1:].reshape(-1)
        ref_loss = torch.nn.functional.cross_entropy(
            shift_logits, shift_labels, ignore_index=-100
        ).item()

    ours = aki_forward(
        params, cfg, jnp.asarray(ids, jnp.int32),
        jnp.asarray(pixels.transpose(0, 2, 3, 1)),
        jnp.asarray(valid, jnp.int32), labels=jnp.asarray(labels, jnp.int32),
        policy=F32, use_flash=False,
    )
    # our spliced labels must equal the reference's
    np.testing.assert_array_equal(
        np.asarray(ours.spliced.labels), ref_labels.numpy()
    )
    assert abs(float(ours.loss) - ref_loss) < 2e-4


def test_forward_logits_mixed_media_no_media(models):
    """Row 1 has no <image> token: the reference inserts nothing for it and
    right-pads at stack; validity of that row ends t_full - (N_VIS-1)."""
    ref, cfg, params = models
    rng = np.random.RandomState(3)
    b, t = 2, 10
    r0 = _rand_prompt(rng, t, media_pos=1, assistant_pos=6)
    ids1 = rng.randint(3, 31000, size=(t,))
    ids1[6] = ASSISTANT
    r1 = (ids1, np.ones(t, np.int64))
    ids = np.stack([r0[0], r1[0]])
    valid = np.stack([r0[1], r1[1]])
    pixels = rng.randn(b, 3, IMG, IMG).astype(np.float32)

    out = _ref_forward(ref, ids, valid, pixels)
    ours = aki_forward(
        params, cfg, jnp.asarray(ids, jnp.int32),
        jnp.asarray(pixels.transpose(0, 2, 3, 1)),
        jnp.asarray(valid, jnp.int32), policy=F32, use_flash=False,
    )
    t_full = t + N_VIS - 1
    _assert_logits_match(out.logits, ours.logits, [t_full, t])


def test_cached_decode_matches_reference_reforward(models):
    """Teacher-forced: our prefill+decode_step next-token logits track the
    reference's full re-forward at every step, and greedy tokens agree.

    (The reference's own cached generate needs transformers==4.41 generation
    internals — `_extract_past_from_model_output` no longer exists — but its
    cached path is by construction equivalent to full re-forward: appending
    a causal row changes no earlier K/V and the MMA window covers only
    vision->question rows.)
    """
    ref, cfg, params = models
    rng = np.random.RandomState(4)
    t = 10
    ids, valid = _rand_prompt(rng, t, media_pos=1, assistant_pos=t - 1)
    ids = ids[None]
    valid = valid[None]
    pixels = rng.randn(1, 3, IMG, IMG).astype(np.float32)
    forced = rng.randint(3, 31000, size=(6,))

    state = prefill(
        params, cfg, jnp.asarray(ids, jnp.int32),
        jnp.asarray(pixels.transpose(0, 2, 3, 1)),
        jnp.asarray(valid, jnp.int32), max_len=64, policy=F32,
        use_flash=False,
    )
    cur = ids.copy()
    our_greedy, ref_greedy = [], []
    for k in range(len(forced)):
        out = _ref_forward(ref, cur, np.ones_like(cur), pixels)
        ref_last = out.logits[0, -1].float().numpy()
        our_last = np.asarray(state.last_logits[0])
        np.testing.assert_allclose(our_last, ref_last, rtol=2e-4, atol=2e-4,
                                   err_msg=f"step {k}")
        # greedy over the base vocab (avoid sampling <image> mid-decode)
        our_greedy.append(int(np.argmax(our_last[:INITIAL])))
        ref_greedy.append(int(np.argmax(ref_last[:INITIAL])))
        tok = int(forced[k])
        cur = np.concatenate([cur, [[tok]]], axis=1)
        state = decode_step(params, cfg, state,
                            jnp.asarray([tok], jnp.int32), policy=F32)
    assert our_greedy == ref_greedy


def test_convert_cli_roundtrip_from_reference_checkpoint(models, tmp_path):
    """The EXACT real-weights flow, rehearsed at tiny geometry: the
    reference model's state_dict saved as checkpoint_{epoch}.pt (the
    trainer's format, vision encoder dropped per train_utils.py:376-410)
    -> convert CLI -> CheckpointManager run dir -> restored params give
    reference-parity logits."""
    ref, cfg, params_direct = models

    sd = {k: v for k, v in ref.state_dict().items()}
    model_sd = {k: v for k, v in sd.items()
                if not k.startswith("vision_encoder.")}
    ckpt_path = tmp_path / "checkpoint_0.pt"
    torch.save({"model_state_dict": model_sd, "epoch": 0, "step": 12},
               ckpt_path)

    # SigLIP arrives as a separate HF dir (safetensors), like the real flow
    from safetensors.numpy import save_file

    siglip_dir = tmp_path / "siglip"
    siglip_dir.mkdir()
    vis_sd = {
        "vision_model." + k.removeprefix("vision_encoder."):
            v.numpy()
        for k, v in sd.items() if k.startswith("vision_encoder.")
    }
    save_file(vis_sd, siglip_dir / "model.safetensors")
    (siglip_dir / "config.json").write_text("{}")

    from aki_tpu.convert.cli import import_checkpoint

    out_dir = tmp_path / "imported"
    # the CLI main() defaults to the aki_4b geometry; at tiny geometry we
    # call the same entry point with the explicit cfg
    import_checkpoint(str(ckpt_path), str(out_dir),
                      siglip=str(siglip_dir), cfg=cfg)

    # restore through the standard manager and check forward parity
    import optax

    from aki_tpu.train.checkpoints import CheckpointManager
    from aki_tpu.train.step import TrainState

    params = jax.tree.map(jnp.asarray, jax.tree.map(np.asarray,
                                                    params_direct))
    init = {k: jax.tree.map(jnp.zeros_like, v) if k != "siglip" else v
            for k, v in params.items()}
    state = TrainState.create(init, optax.sgd(0.0))
    state, _ = CheckpointManager(str(out_dir)).restore(state)
    assert int(state.step) == 12

    rng = np.random.RandomState(11)
    t = 10
    ids, valid = _rand_prompt(rng, t, media_pos=1, assistant_pos=6)
    ids, valid = ids[None], valid[None]
    pixels = rng.randn(1, 3, IMG, IMG).astype(np.float32)
    out_ref = _ref_forward(ref, ids, valid, pixels)
    ours = aki_forward(
        state.params, cfg, jnp.asarray(ids, jnp.int32),
        jnp.asarray(pixels.transpose(0, 2, 3, 1)),
        jnp.asarray(valid, jnp.int32), policy=F32, use_flash=False,
    )
    np.testing.assert_allclose(
        np.asarray(ours.logits)[0], out_ref.logits[0].float().numpy(),
        rtol=2e-4, atol=2e-4,
    )


@pytest.mark.parametrize("immediate", [True, False])
@pytest.mark.parametrize("use_cached", [False, True])
def test_gated_xattn_matches_reference(immediate, use_cached):
    """Pin the legacy Flamingo gated cross-attention block
    (helpers.py:203-346) to the reference module itself: same weights,
    same media-time masking, both attend-immediate and attend-all modes,
    prefill and cached-decode text-time variants."""
    _load_ref_aki()
    helpers = importlib.import_module("refof.src.helpers")

    from aki_tpu.models.flamingo import gated_xattn_block

    dim, dim_visual, dim_head, heads, ff_mult = 32, 24, 8, 2, 2
    torch.manual_seed(3)
    ref_blk = helpers.GatedCrossAttentionBlock(
        dim=dim, dim_visual=dim_visual, dim_head=dim_head, heads=heads,
        ff_mult=ff_mult, only_attend_immediate_media=immediate,
    ).eval().float()
    with torch.no_grad():
        ref_blk.attn_gate.fill_(0.7)   # open the gates (init 0 = identity)
        ref_blk.ff_gate.fill_(-0.3)

    sd = ref_blk.state_dict()
    t = lambda k: jnp.asarray(sd[k].numpy().T.copy())
    a = lambda k: jnp.asarray(sd[k].numpy())
    xp = {
        "norm": {"scale": a("attn.norm.weight")[None],
                 "bias": a("attn.norm.bias")[None]},
        "to_q": t("attn.to_q.weight")[None],
        "to_kv": t("attn.to_kv.weight")[None],
        "to_out": t("attn.to_out.weight")[None],
        "attn_gate": a("attn_gate")[None],
        "ff_ln": {"scale": a("ff.0.weight")[None],
                  "bias": a("ff.0.bias")[None]},
        "ff1": t("ff.1.weight")[None],
        "ff2": t("ff.3.weight")[None],
        "ff_gate": a("ff_gate")[None],
    }
    xp = jax.tree.map(lambda v: v[0], xp)  # single block: drop the G dim

    rng = np.random.RandomState(4)
    b, t_txt, t_img, n_lat = 2, 10, 2, 3
    x = rng.randn(b, t_txt, dim).astype(np.float32)
    media = rng.randn(b, t_img, n_lat, dim_visual).astype(np.float32)
    locs = np.zeros((b, t_txt), bool)
    locs[0, 1] = locs[0, 5] = True   # two media in row 0
    locs[1, 3] = True                # one in row 1

    with torch.no_grad():
        want = ref_blk(
            torch.tensor(x), torch.tensor(media),
            media_locations=torch.tensor(locs),
            use_cached_media=use_cached,
        ).numpy()

    got = gated_xattn_block(
        xp, jnp.asarray(x), jnp.asarray(media), jnp.asarray(locs),
        heads=heads, dim_head=dim_head,
        only_attend_immediate_media=immediate,
        use_cached_media=use_cached,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)
