"""ARCHITECTURE -> model factory.

Mirrors the dispatch at reference train/train_transformer.py:1968-2087 and
eval/eval_transformer.py:191-315 (build_model): the same public config keys
select and parameterize the backbone.
"""

from __future__ import annotations

import jax.numpy as jnp


MODEL_PRESETS = ("Swin", "SwinDPL", "MedViT", "ViT", "ResNet")


def model_dtype(cfg):
    """bf16 compute when FP16 (mixed precision) is on — TPU-native choice
    replacing the reference's fp16 + GradScaler (train_transformer.py:1065-1072).
    Params always stay f32. FP64 is a CPU-only oracle mode used by the
    golden cross-framework parity harness (scripts/golden_parity.py):
    BN-at-init grad comparisons are ill-conditioned in f32, so the
    reference-equivalence proof runs both frameworks in f64."""
    if cfg.get("FP64", False):
        return jnp.float64
    return jnp.bfloat16 if cfg.get("FP16", True) else jnp.float32


def build_model(cfg):
    arch = cfg.ARCHITECTURE
    dtype = model_dtype(cfg)
    if arch == "ViT":
        from vsn_tpu.models.vit3d import vit_from_config

        return vit_from_config(cfg, dtype=dtype)
    if arch == "Swin":
        from vsn_tpu.models.swin3d import swin_from_config

        return swin_from_config(cfg, dtype=dtype)
    if arch == "SwinDPL":
        # Public-interface stub: the DPL variant is proprietary upstream
        # (reference models/swin_transformer_dpl_3d.py:14-31 raises
        # NotImplementedError from its constructor).
        raise NotImplementedError(
            "SwinDPL (Deformable Patch Location) is a private architecture; "
            "the public interface is a stub in the reference as well."
        )
    if arch == "MedViT":
        from vsn_tpu.models.medvit3d import medvit_from_config

        return medvit_from_config(cfg, dtype=dtype)
    if arch == "ResNet":
        from vsn_tpu.models.resnet3d import resnet_from_config

        return resnet_from_config(cfg, dtype=dtype)
    raise ValueError(f"Unknown ARCHITECTURE {arch!r}; expected one of {MODEL_PRESETS}")
