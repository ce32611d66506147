"""Real-WIDTH differential tests against the reference implementation.

`tests/test_reference_parity.py` pins forward/loss/decode parity at toy
widths (dim 32); this module re-runs the same oracle at the REAL AKI-4B
widths with depth truncated to 2 layers for CPU feasibility (VERDICT r3
missing #2): hidden 3072, 32 heads, head_dim 96 (LongRoPE short/long
factors ACTIVE — 48 entries = head_dim/2), intermediate 8192, SigLIP
1152/4304 at the real 384px/14px geometry (729 patches), Perceiver at
its real depth 6 with 144 latents, vocab 32064 with the real decoupled
layout (initial 32011 + <image>/<|endofchunk|>).

Bugs this catches that the tiny suite cannot: rope table indexing at
d=96 with LongRoPE attention scaling, the 1152->3072 perceiver
projection, the 27x27 conv-patch refold, decoupled-vocab routing at the
real 32011 boundary, and splice arithmetic at 144 vision tokens.

Reference: ``src/aki.py:9-210`` instantiated at the ``configs/sft.yaml:
42-45`` geometry (SigLIP-SO400M-patch14-384 + Phi-3.5-mini-instruct).
"""

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
    PHI35_MINI_LONG_FACTOR, PHI35_MINI_SHORT_FACTOR,
)

from tests.test_reference_parity import (  # noqa: E402  (test helpers)
    _load_ref_aki, _shim_4d_mask_inversion, _ref_forward,
    _assert_logits_match, VOCAB, INITIAL, PAD, ASSISTANT, MEDIA, EOC,
)

N_VIS = 144            # real latent count
IMG = 384              # real SigLIP-SO400M input (729 patches)
DEPTH = 2              # CPU-feasible truncation; widths stay real

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def models():
    from transformers import Phi3Config as HFPhi3Config
    from transformers import SiglipVisionConfig as HFSiglipVisionConfig
    from transformers.models.phi3.modeling_phi3 import Phi3ForCausalLM
    from transformers.models.siglip.modeling_siglip import SiglipVisionModel

    ref_aki_mod = _load_ref_aki()
    torch.manual_seed(11)
    hf_phi = Phi3ForCausalLM(HFPhi3Config(
        vocab_size=VOCAB, hidden_size=3072, intermediate_size=8192,
        num_hidden_layers=DEPTH, num_attention_heads=32,
        num_key_value_heads=32,
        max_position_embeddings=131072,
        original_max_position_embeddings=4096,
        rope_theta=10000.0,
        rope_scaling={
            "type": "longrope",
            "short_factor": list(PHI35_MINI_SHORT_FACTOR),
            "long_factor": list(PHI35_MINI_LONG_FACTOR),
        },
        sliding_window=None, pad_token_id=PAD, bos_token_id=1,
        eos_token_id=2, attn_implementation="eager",
    )).eval().float()
    hf_siglip = SiglipVisionModel(HFSiglipVisionConfig(
        hidden_size=1152, intermediate_size=4304, num_hidden_layers=DEPTH,
        num_attention_heads=16, image_size=IMG, patch_size=14,
    )).eval().float()

    ref = ref_aki_mod.AKI(
        vision_encoder=hf_siglip.vision_model,
        lang_model=hf_phi,
        vis_feature_dim=1152,
        initial_tokenizer_len=INITIAL,
        pad_token_id=PAD,
        decoder_layers_attr_name="model.layers",
        num_vision_tokens=N_VIS,       # real Perceiver: depth 6, 144 lat
    )
    ref.set_special_token_ids({"<image>": MEDIA, "<|endofchunk|>": EOC})
    ref = ref.eval().float()
    _shim_4d_mask_inversion(ref.lang_model)

    cfg = AKIConfig(
        phi3=Phi3Config(
            num_layers=DEPTH,
            rope_short_factor=PHI35_MINI_SHORT_FACTOR,
            rope_long_factor=PHI35_MINI_LONG_FACTOR,
        ),
        siglip=SigLIPVisionConfig(num_layers=DEPTH),
        perceiver=PerceiverConfig(),
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


def _prompt(rng, t, media_pos, assistant_pos, n_pad=0, eoc_pos=None):
    ids = rng.randint(3, 31000, size=(t,))
    ids[media_pos] = MEDIA
    ids[assistant_pos] = ASSISTANT
    if eoc_pos is not None:
        ids[eoc_pos] = EOC          # decoupled-embedding row above 32011
    valid = np.ones(t, np.int64)
    if n_pad:
        ids[t - n_pad:] = PAD
        valid[t - n_pad:] = 0
    return ids, valid


def test_realwidth_forward_logits(models):
    """Forward logits at 3072/32h/96d with LongRoPE + 144-latent splice,
    incl. a right-padded row and an <|endofchunk|> (decoupled row)."""
    ref, cfg, params = models
    rng = np.random.RandomState(0)
    b, t = 2, 12
    rows = [_prompt(rng, t, media_pos=1, assistant_pos=7, eoc_pos=9),
            _prompt(rng, t, media_pos=2, assistant_pos=6, n_pad=3)]
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
    # fp32 accumulation order differs (torch MKL vs XLA) — at 3072-dim
    # dots the row-to-row spread is ~1e-5 relative; 1e-3 is ~100x margin
    _assert_logits_match(out.logits, ours.logits, [t_full, t_full - 3],
                         tol=1e-3)


def test_realwidth_loss(models):
    """CE over the reference's own spliced labels at real widths."""
    ref, cfg, params = models
    rng = np.random.RandomState(2)
    b, t = 2, 12
    rows = [_prompt(rng, t, media_pos=1, assistant_pos=5),
            _prompt(rng, t, media_pos=3, assistant_pos=7, n_pad=2)]
    ids = np.stack([r[0] for r in rows])
    valid = np.stack([r[1] for r in rows])
    labels = np.where(valid == 1, ids, -100)
    labels[:, :6] = -100
    pixels = rng.randn(b, 3, IMG, IMG).astype(np.float32)

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
        ref_loss = torch.nn.functional.cross_entropy(
            shift_logits, ref_labels[:, 1:].reshape(-1), ignore_index=-100
        ).item()

    ours = aki_forward(
        params, cfg, jnp.asarray(ids, jnp.int32),
        jnp.asarray(pixels.transpose(0, 2, 3, 1)),
        jnp.asarray(valid, jnp.int32),
        labels=jnp.asarray(labels, jnp.int32), policy=F32, use_flash=False,
    )
    np.testing.assert_array_equal(
        np.asarray(ours.spliced.labels), ref_labels.numpy()
    )
    assert abs(float(ours.loss) - ref_loss) < 1e-3


def test_realwidth_cached_decode(models):
    """Teacher-forced: prefill+decode_step next-token logits track the
    reference full re-forward at real widths (cached-position rope at
    d=96/LongRoPE is the decode-only surface this pins)."""
    ref, cfg, params = models
    rng = np.random.RandomState(4)
    t = 10
    ids, valid = _prompt(rng, t, media_pos=1, assistant_pos=t - 1)
    ids, valid = ids[None], valid[None]
    pixels = rng.randn(1, 3, IMG, IMG).astype(np.float32)
    forced = rng.randint(3, 31000, size=(3,))

    state = prefill(
        params, cfg, jnp.asarray(ids, jnp.int32),
        jnp.asarray(pixels.transpose(0, 2, 3, 1)),
        jnp.asarray(valid, jnp.int32), max_len=192, policy=F32,
        use_flash=False,
    )
    cur = ids.copy()
    our_greedy, ref_greedy = [], []
    for k in range(len(forced)):
        out = _ref_forward(ref, cur, np.ones_like(cur), pixels)
        ref_last = out.logits[0, -1].float().numpy()
        our_last = np.asarray(state.last_logits[0])
        np.testing.assert_allclose(our_last, ref_last, rtol=1e-3, atol=1e-3,
                                   err_msg=f"step {k}")
        our_greedy.append(int(np.argmax(our_last[:INITIAL])))
        ref_greedy.append(int(np.argmax(ref_last[:INITIAL])))
        tok = int(forced[k])
        cur = np.concatenate([cur, [[tok]]], axis=1)
        state = decode_step(params, cfg, state,
                            jnp.asarray([tok], jnp.int32), policy=F32)
    assert our_greedy == ref_greedy
