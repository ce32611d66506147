"""aki_tpu — a TPU-native (JAX / XLA / Pallas / pjit) multimodal LLM framework.

Re-implements the full capability surface of sony/aki ("Seeing is
Understanding", modality-mutual attention) designed TPU-first:

- ``ops``      — Pallas flash attention with the MMA block mask, RoPE, and
                 dense reference implementations used as numerics oracles.
- ``models``   — SigLIP ViT encoder, Perceiver resampler, Phi-3 decoder,
                 decoupled embeddings, and the AKI fusion model (static-shape
                 vision-token splice instead of per-sample Python loops).
- ``parallel`` — device mesh (ICI/DCN), sharding rules (dp/fsdp/tp),
                 distributed init.
- ``data``     — webdataset-compatible tar shard reader, pretrain pipeline,
                 SFT datasets + chat templates + weighted mixture, collate.
- ``train``    — pjit train step, optimizer/schedule factories, checkpointing.
- ``infer``    — KV-cache generation engine (MMA prefill, causal decode),
                 CV-Bench eval, demo server.
"""

__version__ = "0.1.0"
