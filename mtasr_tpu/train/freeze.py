"""Freeze-all-then-selectively-unfreeze, the reference's trainability policy
(/root/reference/utils/freeze_utils.py + unfreeze_utils.py:39-97):

1. freeze everything
2. always unfreeze: encoder adapter + masked_spec_embed (skipped in pure-CTC
   mode), enc_to_dec_proj
3. CSV-substring-driven unfreezes for encoder / decoder / others
   (partial_encoder_unfreeze etc., src/arguments.py:173-203)
4. conv feature extractor stays frozen (freeze_feature_encoder)

In JAX, "frozen" = zero-update: the mask feeds optax.masked so frozen params
get no optimizer state (memory win vs. torch requires_grad).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import jax

from mtasr_tpu.parallel.mesh import _path_str


def trainable_mask(
    params: dict,
    *,
    train_mode: str = "attention",
    freeze_feature_encoder: bool = True,
    freeze_encoder: bool = False,
    freeze_decoder: bool = False,
    partial_encoder_unfreeze: Sequence[str] = ("masked_spec_embed",),
    partial_decoder_unfreeze: Sequence[str] = (),
    partial_others_unfreeze: Sequence[str] = ("enc_to_dec_proj", "ctc"),
    train_all: bool = False,
) -> dict:
    """Returns a bool tree: True = trainable."""
    def decide(path, leaf) -> bool:
        if train_all:
            return True
        s = _path_str(path)
        top = s.split("/")[0]

        if top == "encoder":
            if freeze_feature_encoder and "/feature_extractor/" in s:
                return False
            if not freeze_encoder:
                # reference unfreezes the whole encoder only when
                # freeze_encoder=False; otherwise selective
                pass
            # always-on unfreezes (unfreeze_utils.py:59-62), except ctc mode
            if train_mode != "ctc":
                if "adapter" in s or "masked_spec_embed" in s:
                    return True
            if not freeze_encoder:
                return not (freeze_feature_encoder and "/feature_extractor/" in s)
            return any(sub and sub in s for sub in partial_encoder_unfreeze)

        if top == "decoder":
            if not freeze_decoder:
                return True
            return any(sub and sub in s for sub in partial_decoder_unfreeze)

        if top == "decoder_lora":
            # LoRA adapters always train (PEFT enable_adapters,
            # finetune_asr.py:127-134) — even with freeze_decoder, which is
            # the reference's standard LoRA recipe. The __meta__ (r/alpha)
            # scalars are structural, never updated.
            return ("lora_A" in s) or ("lora_B" in s)

        # others: separator, serialized_ctc, enc_to_dec_proj, adapters, ...
        always = ("enc_to_dec_proj" in s)
        partial = any(sub and sub in s for sub in partial_others_unfreeze)
        # separator/serialized_ctc/cross_att_adap/serilized_refine are the
        # trainable research modules — trainable unless explicitly excluded
        default_on = top in ("separator", "serialized_ctc", "cross_att_adap",
                             "serilized_refine", "ctc_extractor_concat")
        return always or partial or default_on

    return jax.tree_util.tree_map_with_path(decide, params)


def freeze_summary(params: dict, mask: dict) -> Dict[str, int]:
    """Trainable-parameter audit (reference utils/param_utils.py:17-33)."""
    import numpy as np
    total = trainable = 0
    leaves = jax.tree_util.tree_leaves_with_path(params)
    masks = jax.tree_util.tree_leaves(mask)
    for (_, p), m in zip(leaves, masks):
        n = int(np.prod(p.shape)) if p.ndim else 1
        total += n
        if m:
            trainable += n
    return {"total": total, "trainable": trainable,
            "frozen": total - trainable}
