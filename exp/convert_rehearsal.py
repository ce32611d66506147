"""Real-weights-day rehearsal: full-size converter dry-run (VERDICT r4 #5a).

Builds a SYNTHETIC reference checkpoint at the real AKI-4B geometry —
`checkpoint_0.pt` with the reference's exact key layout (fused qkv /
gate_up `lang_model.*` rows, `vision_tokenizer.*` perceiver, Decoupled
extra tables, no vision encoder — the reference drops it,
`train/train_utils.py:376-410`) plus a SigLIP-so400m safetensors dir —
then runs `aki_tpu.convert.cli.import_checkpoint` end to end and reports:

- wall time per phase (synthesize / torch.load / convert / orbax save)
- peak host RSS (ru_maxrss), the feasibility number for a 16 GB fp32 load
- a spot-check that the imported orbax tree restores and matches the
  source tensors (first/last elements of embed + one per-layer kernel)

Run on the HOST only (no TPU involvement):
    PYTHONPATH=/root/repo:/root/.axon_site python exp/convert_rehearsal.py
Knobs: OUT=/tmp/convert_rehearsal KEEP=0 (keep artifacts) HALF=1 (save the
.pt in fp16 to halve disk, converter upcasts — the released checkpoints
are bf16/fp16 anyway)
"""
import os
import resource
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

OUT = os.environ.get("OUT", "/tmp/convert_rehearsal")
KEEP = os.environ.get("KEEP", "0") == "1"
HALF = os.environ.get("HALF", "1") == "1"


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def t(msg, t0):
    print(f"{msg}: {time.perf_counter() - t0:6.1f}s  peak RSS {rss_gb():5.1f} GB",
          flush=True)


def synth_checkpoint(cfg, path):
    """Reference-layout state_dict with the real tensor shapes. Content is
    a cheap deterministic ramp (np.empty + arange fill) — RAM/disk/time are
    what's under test, not numerics; a few probe tensors get real random
    values for the round-trip spot check."""
    import torch

    dt = torch.float16 if HALF else torch.float32
    p3, sig, pc = cfg.phi3, cfg.siglip, cfg.perceiver
    h, inter = p3.hidden_size, p3.intermediate_size
    nh, nkv, dh = p3.num_heads, p3.num_kv_heads, p3.head_dim
    sd = {}

    def mk(shape, seed=None):
        n = int(np.prod(shape))
        if seed is not None:
            g = torch.Generator().manual_seed(seed)
            return torch.randn(*shape, generator=g, dtype=torch.float32).to(dt)
        # ramp fill: fast, unique-ish, finite
        x = torch.arange(n, dtype=torch.float32) % 997 / 997.0 - 0.5
        return x.reshape(shape).to(dt)

    sd["lang_model.model.embed_tokens.weight"] = mk((p3.vocab_size, h), seed=1)
    sd["lang_model.model.embed_tokens.additional_embedding.weight"] = mk(
        (cfg.num_extra_tokens, h), seed=2)
    for i in range(p3.num_layers):
        p = f"lang_model.model.layers.{i}."
        sd[p + "input_layernorm.weight"] = mk((h,))
        sd[p + "self_attn.qkv_proj.weight"] = mk(
            ((nh + 2 * nkv) * dh, h), seed=100 + i if i in (0, 31) else None)
        sd[p + "self_attn.o_proj.weight"] = mk((h, nh * dh))
        sd[p + "post_attention_layernorm.weight"] = mk((h,))
        sd[p + "mlp.gate_up_proj.weight"] = mk((2 * inter, h))
        sd[p + "mlp.down_proj.weight"] = mk((h, inter))
    sd["lang_model.model.norm.weight"] = mk((h,))
    sd["lang_model.lm_head.weight"] = mk((p3.vocab_size, h))
    sd["lang_model.lm_head.bias"] = mk((p3.vocab_size,))
    sd["lang_model.lm_head.additional_fc.weight"] = mk((cfg.num_extra_tokens, h))
    sd["lang_model.lm_head.additional_fc.bias"] = mk((cfg.num_extra_tokens,))

    # perceiver (vision_tokenizer.*), reference helpers.py:105-199 layout
    d, di = pc.dim, pc.dim_head * pc.heads   # attention inner = 512
    sd["vision_tokenizer.latents"] = mk((pc.num_latents, d), seed=3)
    for i in range(pc.depth):
        a, f = f"vision_tokenizer.layers.{i}.0.", f"vision_tokenizer.layers.{i}.1."
        sd[a + "norm_media.weight"] = mk((d,))
        sd[a + "norm_media.bias"] = mk((d,))
        sd[a + "norm_latents.weight"] = mk((d,))
        sd[a + "norm_latents.bias"] = mk((d,))
        sd[a + "to_q.weight"] = mk((di, d))
        sd[a + "to_kv.weight"] = mk((2 * di, d))
        sd[a + "to_out.weight"] = mk((d, di))
        sd[f + "0.weight"] = mk((d,))
        sd[f + "0.bias"] = mk((d,))
        sd[f + "1.weight"] = mk((d * pc.ff_mult, d))
        sd[f + "3.weight"] = mk((d, d * pc.ff_mult))
    sd["vision_tokenizer.norm.weight"] = mk((d,))
    sd["vision_tokenizer.norm.bias"] = mk((d,))
    sd["vision_tokenizer.projection.weight"] = mk((pc.dim_inner, d))
    sd["vision_tokenizer.projection.bias"] = mk((pc.dim_inner,))

    n = sum(v.numel() for v in sd.values())
    torch.save({"model_state_dict": sd, "epoch": 0, "step": 1234}, path)
    return n


def synth_siglip_dir(cfg, dirpath):
    from safetensors.numpy import save_file

    sig = cfg.siglip
    hs, inter, L = sig.hidden_size, sig.intermediate_size, sig.num_layers
    n_patch = (sig.image_size // sig.patch_size) ** 2
    dt = np.float16 if HALF else np.float32
    sd = {}

    def mk(shape, seed=None):
        if seed is not None:
            return np.random.RandomState(seed).randn(*shape).astype(dt)
        n = int(np.prod(shape))
        return ((np.arange(n, dtype=np.float32) % 991 / 991.0 - 0.5)
                .reshape(shape).astype(dt))

    sd["vision_model.embeddings.patch_embedding.weight"] = mk(
        (hs, 3, sig.patch_size, sig.patch_size), seed=4)
    sd["vision_model.embeddings.patch_embedding.bias"] = mk((hs,))
    sd["vision_model.embeddings.position_embedding.weight"] = mk((n_patch, hs))
    for i in range(L):
        p = f"vision_model.encoder.layers.{i}."
        for nm in ("layer_norm1", "layer_norm2"):
            sd[p + nm + ".weight"] = mk((hs,))
            sd[p + nm + ".bias"] = mk((hs,))
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[p + f"self_attn.{nm}.weight"] = mk((hs, hs))
            sd[p + f"self_attn.{nm}.bias"] = mk((hs,))
        sd[p + "mlp.fc1.weight"] = mk((inter, hs))
        sd[p + "mlp.fc1.bias"] = mk((inter,))
        sd[p + "mlp.fc2.weight"] = mk((hs, inter))
        sd[p + "mlp.fc2.bias"] = mk((hs,))
    sd["vision_model.post_layernorm.weight"] = mk((hs,))
    sd["vision_model.post_layernorm.bias"] = mk((hs,))
    os.makedirs(dirpath, exist_ok=True)
    save_file(sd, os.path.join(dirpath, "model.safetensors"))
    return sum(v.size for v in sd.values())


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")  # host-only rehearsal
    from aki_tpu.models.configs import aki_4b

    cfg = aki_4b()
    os.makedirs(OUT, exist_ok=True)
    ckpt = os.path.join(OUT, "checkpoint_0.pt")
    sig_dir = os.path.join(OUT, "siglip")
    run_dir = os.path.join(OUT, "imported")

    t0 = time.perf_counter()
    n_lang = synth_checkpoint(cfg, ckpt)
    t(f"synthesize lang ckpt ({n_lang / 1e9:.2f}B params, "
      f"{os.path.getsize(ckpt) / 1e9:.1f} GB on disk)", t0)

    t0 = time.perf_counter()
    n_vis = synth_siglip_dir(cfg, sig_dir)
    t(f"synthesize siglip dir ({n_vis / 1e6:.0f}M params)", t0)

    t0 = time.perf_counter()
    from aki_tpu.convert.cli import import_checkpoint

    params = import_checkpoint(ckpt, run_dir, siglip=sig_dir)
    t("import_checkpoint (load + convert + orbax save)", t0)

    # round-trip spot check on the seeded probe tensors
    import torch

    g = torch.Generator().manual_seed(1)
    embed_ref = torch.randn(cfg.phi3.vocab_size, cfg.phi3.hidden_size,
                            generator=g)
    if HALF:
        embed_ref = embed_ref.half().float()
    got = np.asarray(params["phi3"]["embed"]["table"])
    np.testing.assert_allclose(got, embed_ref.numpy(), rtol=0, atol=0)
    nh, nkv, dh = (cfg.phi3.num_heads, cfg.phi3.num_kv_heads,
                   cfg.phi3.head_dim)
    g = torch.Generator().manual_seed(100)
    qkv0 = torch.randn((nh + 2 * nkv) * dh, cfg.phi3.hidden_size, generator=g)
    if HALF:
        qkv0 = qkv0.half().float()
    np.testing.assert_allclose(np.asarray(params["phi3"]["layers"]["wq"][0]),
                               qkv0[: nh * dh].numpy().T, rtol=0, atol=0)
    print("round-trip spot check: EXACT (embed + layer-0 wq)", flush=True)

    # restore through the manager (what eval/demo do on the real day)
    t0 = time.perf_counter()
    sz = sum(f.stat().st_size for f in __import__("pathlib").Path(run_dir)
             .rglob("*") if f.is_file())
    print(f"orbax run dir: {sz / 1e9:.1f} GB", flush=True)
    import optax

    from aki_tpu.train.checkpoints import CheckpointManager
    from aki_tpu.train.step import TrainState

    tmpl = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                        params)
    state, step = CheckpointManager(run_dir).restore(
        TrainState.create(jax.tree.map(np.zeros_like, params),
                          optax.sgd(0.0)))
    got2 = np.asarray(state.params["phi3"]["embed"]["table"])
    np.testing.assert_allclose(got2, embed_ref.numpy(), rtol=0, atol=0)
    # the frozen SigLIP tower MUST survive the run-dir round trip: before
    # round 5 the converter saved through the training-checkpoint path,
    # which drops frozen subtrees — every downstream restore served a
    # RANDOM vision tower (the zeros template here would expose it)
    flat_src = jax.tree.leaves(params["siglip"])
    flat_got = jax.tree.leaves(state.params["siglip"])
    assert len(flat_src) == len(flat_got)
    for a, b in zip(flat_src, flat_got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    t(f"restore via CheckpointManager (step {step}) + re-verify embed "
      "+ FULL siglip tower", t0)

    if not KEEP:
        shutil.rmtree(OUT)
    print(f"FINAL peak RSS {rss_gb():.1f} GB "
          f"(host has {os.sysconf('SC_PHYS_PAGES') * os.sysconf('SC_PAGE_SIZE') / 1e9:.0f} GB)",
          flush=True)


if __name__ == "__main__":
    main()
