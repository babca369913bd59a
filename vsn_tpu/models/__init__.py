"""Model zoo: 3D Swin / ViT / MedViT / ResNet backbones (flax.linen).

``build_model(cfg)`` is the single factory mapping the public ARCHITECTURE
config key to a model, mirroring the dispatch at reference
train/train_transformer.py:1968-2087.
"""

from vsn_tpu.models.factory import build_model, MODEL_PRESETS  # noqa: F401
