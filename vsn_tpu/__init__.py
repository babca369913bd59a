"""vsn_tpu — TPU-native framework for stability/robustness studies of 3D vision
transformers on neurodegenerative-disease MRI classification.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of the PyTorch reference
framework (EloiNavet/ViT-Stability-Neurodegeneration): 3D Swin / ViT / MedViT /
ResNet backbones, a configurable stabilization stack (EMA, SAM, MixUp/CutMix,
label smoothing, ShakeDrop, LayerScale, DeepScaleLM stable residuals, balanced
sampling) and an uncertainty-quantification eval protocol (TTA, snapshot
ensembling, temperature scaling, bootstrap CIs, ECE/MCE/Brier).

Design principles (TPU-first, not a port):
  * one jitted train step per fold: grad-accumulation via ``lax.scan``, SAM's
    two-pass ascent/descent inside the step, NaN-guarded functional updates;
  * static shapes everywhere — Swin shift masks are precomputed at trace time;
  * bf16 compute / f32 params instead of fp16 + GradScaler;
  * data parallelism by sharding the batch over a ``jax.sharding.Mesh`` — XLA
    emits the gradient psum, no hand-written collectives;
  * hot window-attention path available as a fused Pallas kernel.
"""

__version__ = "0.1.0"
