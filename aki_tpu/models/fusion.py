"""Vision-token splice into the language stream — static shapes, no loops.

The reference splices ``n_vis`` perceiver tokens at each ``<image>`` position
with a per-sample Python loop of ``torch.cat`` calls
(``codes/open_flamingo/src/vlm.py:445-603``).  That is untraceable under XLA.
Here the splice is a pure vectorized gather over a *fixed* output length
``T_full = T_txt + n_img * (n_vis - 1)``: every spliced position computes a
source (text index or vision index) with ``jnp.where``, so the jitted graph
has static shapes and maps onto TPU gathers.

Reference behaviors reproduced:

- labels over vision spans become ``-100`` (``vlm.py:566-577``);
- vision positions are attention-valid (``vlm.py:531-533``);
- the MMA spec per sample is ``(img_idx, img_idx + n_vis,
  assistant_idx + n_vis)`` with ``assistant_idx = 0`` when absent
  (``vlm.py:492-496, 556-564``);
- samples without an ``<image>`` token stay pure text with spec
  ``(0, 0, assistant_idx)`` (``vlm.py:498-512``); their ``n_vis`` unused
  slots are parked at the sequence tail with validity 0;
- ``collapse_logits`` maps spliced logits back to text positions, keeping the
  logit of the *first* vision token at the ``<image>`` position
  (``vlm.py:605-648``).

DOT ablation (text-before-image ordering, ``vlm.py:461``) is
``order="text_first"``: the question tokens (everything up to and including
``<|assistant|>``) are placed *before* the vision tokens and the spec
collapses to causal.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.masks import MMASpec

IGNORE_INDEX = -100


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SplicedBatch:
    """Result of splicing vision tokens into the text stream."""

    embeds: jax.Array        # (B, T_full, D)
    attn_valid: jax.Array    # (B, T_full) int32 0/1
    labels: jax.Array | None  # (B, T_full) int32, -100 on vision/pad
    spec: MMASpec            # block-mask spec in spliced coordinates
    text_pos: jax.Array      # (B, T_txt) int32: spliced index of each text pos
    positions: jax.Array     # (B, T_full) int32 RoPE positions (= arange)


def _first_index_of(ids: jax.Array, token_id: int) -> tuple[jax.Array, jax.Array]:
    """(first index of token_id per row, whether it occurs). Index is 0 when absent."""
    hit = ids == token_id
    any_hit = jnp.any(hit, axis=1)
    idx = jnp.argmax(hit, axis=1).astype(jnp.int32)
    return jnp.where(any_hit, idx, 0), any_hit


def splice_vision_tokens(
    text_embeds: jax.Array,
    vision_tokens: jax.Array,
    input_ids: jax.Array,
    attn_valid: jax.Array,
    media_token_id: int,
    assistant_token_id: int,
    labels: jax.Array | None = None,
    order: str = "image_first",
) -> SplicedBatch:
    """Splice one image's vision tokens into each sequence.

    Args:
        text_embeds: (B, T_txt, D) language embeddings of ``input_ids``.
        vision_tokens: (B, n_vis, D) perceiver outputs.
        input_ids: (B, T_txt) token ids containing one ``<image>`` token.
        attn_valid: (B, T_txt) 0/1 text validity (right-padded).
        media_token_id / assistant_token_id: special-token ids.
        labels: optional (B, T_txt); vision spans get ``IGNORE_INDEX``.
        order: "image_first" (reference) or "text_first" (DOT ablation —
            causal mask, question before image).

    Returns:
        :class:`SplicedBatch` of length ``T_full = T_txt + n_vis - 1``.
    """
    b, t_txt, d = text_embeds.shape
    n_vis = vision_tokens.shape[1]
    t_full = t_txt + n_vis - 1

    ids = input_ids.astype(jnp.int32)
    img_idx, has_img = _first_index_of(ids, media_token_id)
    asst_idx, _ = _first_index_of(ids, assistant_token_id)

    if order == "text_first":
        # DOT: move the vision block to just after <|assistant|>'s preceding
        # text, i.e. question text first.  Implemented by relocating the
        # insertion point to asst_idx (vision block sits where the question
        # ends); the <image> placeholder is dropped from the text stream.
        # Text order: [tokens before <image>] + [tokens after <image> up to
        # asst] + vision + rest.  We realize this by remapping text indices.
        return _splice_text_first(
            text_embeds, vision_tokens, ids, attn_valid, labels,
            img_idx, has_img, asst_idx,
        )
    if order != "image_first":
        raise ValueError(f"unknown order: {order}")

    # Imageless rows: park the vision block at the tail (invalid positions).
    ins = jnp.where(has_img, img_idx, t_txt).astype(jnp.int32)  # (B,)

    pos = jax.lax.broadcasted_iota(jnp.int32, (b, t_full), 1)
    ins_b = ins[:, None]
    is_vis = (pos >= ins_b) & (pos < ins_b + n_vis)
    vis_idx = jnp.clip(pos - ins_b, 0, n_vis - 1)
    # text source index: before the block -> pos; after -> pos - (n_vis - 1).
    text_idx = jnp.where(pos < ins_b + n_vis, jnp.minimum(pos, ins_b), pos - (n_vis - 1))
    text_idx = jnp.clip(text_idx, 0, t_txt - 1)

    gathered_text = jnp.take_along_axis(text_embeds, text_idx[..., None], axis=1)
    gathered_vis = jnp.take_along_axis(vision_tokens, vis_idx[..., None], axis=1)
    embeds = jnp.where(is_vis[..., None], gathered_vis, gathered_text)

    text_valid = jnp.take_along_axis(attn_valid.astype(jnp.int32), text_idx, axis=1)
    # Vision block valid only when the sample actually has an image.
    valid = jnp.where(is_vis, has_img[:, None].astype(jnp.int32), text_valid)

    out_labels = None
    if labels is not None:
        lt = jnp.take_along_axis(labels.astype(jnp.int32), text_idx, axis=1)
        out_labels = jnp.where(is_vis, IGNORE_INDEX, lt)

    # Spec (vlm.py:556-564 and the no-image branch at :498-508).
    img_start = jnp.where(has_img, ins, 0)
    txt_start = jnp.where(has_img, ins + n_vis, 0)
    txt_end = jnp.where(has_img, asst_idx + n_vis, asst_idx)
    spec = MMASpec(
        img_start=img_start.astype(jnp.int32),
        txt_start=txt_start.astype(jnp.int32),
        txt_end=txt_end.astype(jnp.int32),
    )

    # Spliced index of each original text position (vlm.py:627-642): the
    # <image> position maps to the first vision slot.
    tpos = jax.lax.broadcasted_iota(jnp.int32, (b, t_txt), 1)
    text_pos = jnp.where(tpos <= ins[:, None], tpos, tpos + (n_vis - 1))

    positions = jax.lax.broadcasted_iota(jnp.int32, (b, t_full), 1)
    return SplicedBatch(
        embeds=embeds, attn_valid=valid, labels=out_labels, spec=spec,
        text_pos=text_pos, positions=positions,
    )


def _splice_text_first(
    text_embeds, vision_tokens, ids, attn_valid, labels,
    img_idx, has_img, asst_idx,
):
    """DOT ordering: question text, then vision tokens, then the answer.

    Output layout per row (when an image is present):
      [text without <image>, up to & incl. <|assistant|>] ++ vision ++ rest.
    The mask is causal (empty MMA block).
    """
    b, t_txt, d = text_embeds.shape
    n_vis = vision_tokens.shape[1]
    t_full = t_txt + n_vis - 1

    # Index of <|assistant|> in text-without-<image> coordinates.
    asst_wo = jnp.where((has_img) & (asst_idx > img_idx), asst_idx - 1, asst_idx)
    ins = jnp.where(has_img, asst_wo + 1, t_txt).astype(jnp.int32)

    pos = jax.lax.broadcasted_iota(jnp.int32, (b, t_full), 1)
    ins_b = ins[:, None]
    is_vis = (pos >= ins_b) & (pos < ins_b + n_vis)
    vis_idx = jnp.clip(pos - ins_b, 0, n_vis - 1)
    # Index into text-without-<image>.
    wo_idx = jnp.where(pos < ins_b, pos, pos - n_vis)
    # Map text-without-<image> index -> original text index (skip img_idx).
    orig_idx = jnp.where(
        (has_img[:, None]) & (wo_idx >= img_idx[:, None]), wo_idx + 1, wo_idx
    )
    orig_idx = jnp.clip(orig_idx, 0, t_txt - 1)

    gathered_text = jnp.take_along_axis(text_embeds, orig_idx[..., None], axis=1)
    gathered_vis = jnp.take_along_axis(vision_tokens, vis_idx[..., None], axis=1)
    embeds = jnp.where(is_vis[..., None], gathered_vis, gathered_text)

    text_valid = jnp.take_along_axis(attn_valid.astype(jnp.int32), orig_idx, axis=1)
    valid = jnp.where(is_vis, has_img[:, None].astype(jnp.int32), text_valid)

    out_labels = None
    if labels is not None:
        lt = jnp.take_along_axis(labels.astype(jnp.int32), orig_idx, axis=1)
        out_labels = jnp.where(is_vis, IGNORE_INDEX, lt)

    z = jnp.zeros((b,), jnp.int32)
    spec = MMASpec(img_start=z, txt_start=z, txt_end=z)  # causal

    tpos = jax.lax.broadcasted_iota(jnp.int32, (b, t_txt), 1)
    wo_of_orig = jnp.where(
        (has_img[:, None]) & (tpos > img_idx[:, None]), tpos - 1, tpos
    )
    text_pos = jnp.where(wo_of_orig < ins[:, None], wo_of_orig, wo_of_orig + n_vis)
    # The <image> position itself points at the first vision slot.
    text_pos = jnp.where(
        (has_img[:, None]) & (tpos == img_idx[:, None]), ins[:, None], text_pos
    )

    positions = jax.lax.broadcasted_iota(jnp.int32, (b, t_full), 1)
    return SplicedBatch(
        embeds=embeds, attn_valid=valid, labels=out_labels, spec=spec,
        text_pos=text_pos, positions=positions,
    )


def collapse_logits(logits: jax.Array, text_pos: jax.Array) -> jax.Array:
    """Gather spliced logits back to text positions (vlm.py:605-648)."""
    return jnp.take_along_axis(
        logits, text_pos[..., None].astype(jnp.int32), axis=1
    )


def _first_n_indices(ids: jax.Array, token_id: int, n: int, fill: int):
    """Indices of the first n occurrences of token_id per row; missing
    occurrences get ``fill``. Returns (idx (B, n) int32, count (B,))."""
    b, t = ids.shape
    hit = (ids == token_id)
    order = jnp.cumsum(hit, axis=1)  # 1-based occurrence number at hits
    occ = jnp.where(hit, order, 0)
    idx = jnp.full((b, n), fill, jnp.int32)
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, t), 1)
    for j in range(n):
        hit_j = occ == (j + 1)
        has = jnp.any(hit_j, axis=1)
        pj = jnp.where(has, jnp.argmax(hit_j, axis=1).astype(jnp.int32), fill)
        idx = idx.at[:, j].set(pj)
    count = jnp.minimum(jnp.sum(hit, axis=1), n).astype(jnp.int32)
    return idx, count


def splice_vision_tokens_multi(
    text_embeds: jax.Array,
    vision_tokens: jax.Array,       # (B, N_img, n_vis, D)
    input_ids: jax.Array,
    attn_valid: jax.Array,
    media_token_id: int,
    assistant_token_id: int,
    labels: jax.Array | None = None,
) -> SplicedBatch:
    """Interleaved multi-image splice (SFT stretch; the reference's Python
    loop nominally supports this at vlm.py:523-577 but its multi-image mask
    rebuild is broken — AKI only ever trains single-image).

    Generalization: image j's MMA block opens rows [s_j, s_j + n_vis) to
    keys [s_j + n_vis, spliced_assistant + 1) — each image attends forward
    to everything up to and including ``<|assistant|>``, reducing exactly
    to the single-image semantics for N_img = 1.
    """
    b, t_txt, d = text_embeds.shape
    n_img, n_vis = vision_tokens.shape[1], vision_tokens.shape[2]
    t_full = t_txt + n_img * (n_vis - 1)
    stride = n_vis - 1

    ids = input_ids.astype(jnp.int32)
    img_idx, n_present = _first_n_indices(ids, media_token_id, n_img, t_txt)
    asst_idx, _ = _first_index_of(ids, assistant_token_id)

    # missing image j: park its block beyond the real content
    slot = jnp.arange(n_img, dtype=jnp.int32)[None]
    present = slot < n_present[:, None]
    park = t_txt + slot * 0  # text length (before offset) for parked blocks
    raw = jnp.where(present, img_idx, park)
    # spliced start of image j's block
    s = raw + slot * stride                                     # (B, N)

    pos = jax.lax.broadcasted_iota(jnp.int32, (b, t_full), 1)   # (B, T_full)
    pe = pos[:, :, None]                                        # (B, T, 1)
    in_img = (pe >= s[:, None]) & (pe < (s + n_vis)[:, None])   # (B, T, N)
    is_vis = jnp.any(in_img, axis=2)
    img_of = jnp.argmax(in_img, axis=2).astype(jnp.int32)       # (B, T)
    off_of = jnp.clip(
        pos - jnp.take_along_axis(s, img_of, axis=1), 0, n_vis - 1
    )
    # images whose block ends at or before pos
    n_done = jnp.sum((pe >= (s + n_vis)[:, None]).astype(jnp.int32), axis=2)
    text_idx = jnp.where(
        is_vis,
        jnp.take_along_axis(raw, img_of, axis=1),  # the <image> slot itself
        pos - n_done * stride,
    )
    text_idx = jnp.clip(text_idx, 0, t_txt - 1)

    gathered_text = jnp.take_along_axis(text_embeds, text_idx[..., None], axis=1)
    flat_vis = vision_tokens.reshape(b, n_img * n_vis, d)
    vis_flat_idx = jnp.clip(img_of * n_vis + off_of, 0, n_img * n_vis - 1)
    gathered_vis = jnp.take_along_axis(flat_vis, vis_flat_idx[..., None], axis=1)
    embeds = jnp.where(is_vis[..., None], gathered_vis, gathered_text)

    text_valid = jnp.take_along_axis(attn_valid.astype(jnp.int32), text_idx, axis=1)
    vis_present = jnp.take_along_axis(
        present.astype(jnp.int32), img_of, axis=1
    )
    valid = jnp.where(is_vis, vis_present, text_valid)

    out_labels = None
    if labels is not None:
        lt = jnp.take_along_axis(labels.astype(jnp.int32), text_idx, axis=1)
        out_labels = jnp.where(is_vis, IGNORE_INDEX, lt)

    # spec: per-image blocks; parked blocks get empty spans
    asst_done = jnp.sum(
        ((asst_idx[:, None, None] >= (raw + 1)[:, None]) & present[:, None]).astype(jnp.int32),
        axis=2,
    )[:, 0]  # images occurring before the assistant token
    asst_spliced = asst_idx + asst_done * stride
    img_start = jnp.where(present, s, 0)
    txt_start = jnp.where(present, s + n_vis, 0)
    txt_end = jnp.where(present, (asst_spliced + 1)[:, None], 0)
    spec = MMASpec(
        img_start=img_start.astype(jnp.int32),
        txt_start=txt_start.astype(jnp.int32),
        txt_end=txt_end.astype(jnp.int32),
    )

    # spliced index of each text position (for logit collapse)
    tpos = jax.lax.broadcasted_iota(jnp.int32, (b, t_txt), 1)
    n_started = jnp.sum(
        ((tpos[:, :, None] > raw[:, None]) & present[:, None]).astype(jnp.int32),
        axis=2,
    )
    text_pos = tpos + n_started * stride

    positions = jax.lax.broadcasted_iota(jnp.int32, (b, t_full), 1)
    return SplicedBatch(
        embeds=embeds, attn_valid=valid, labels=out_labels, spec=spec,
        text_pos=text_pos, positions=positions,
    )
