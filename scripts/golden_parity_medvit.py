"""MedViT leg of the golden cross-framework parity harness.

Ports the reference MedViTV1-S state_dict (models/medvit_3d.py +
models/modules/medvit_utils.py) into the vsn_tpu param tree
(vsn_tpu/models/medvit3d.py: blocks flattened as ``s{stage}_b{block}_ecb`` /
``..._ltb``) and runs the shared forward/grad comparison from
scripts/golden_parity.py. Run in f64 (BN-at-init ill-conditioning — see
golden_parity._compare).

Port-divergence risks this specifically covers (VERDICT r4 missing #1):
E-MHSA's flattened-sequence AvgPool1d spatial reduction + BatchNorm1d
(medvit_utils.py:594-705), PatchEmbed's ceil-mode avgpool (319-374),
LocalityFeedForward's h-swish/SE stack (427-532), and the grouped-conv
MHCA layout (377-419).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.golden_parity import (  # noqa: E402
    _bn,
    _compare,
    _dense,
    conv,
    import_reference,
    t2n,
)

# MedViTV1-S structure (reference _MEDVITV1_CONFIGS + stage_block_types):
# depths [3,4,10,3]; ECB everywhere except the last block of stages 1/3 and
# blocks 4, 9 of stage 2 (the [ECB x4, LTB] x 2 pattern).
DEPTHS = [3, 4, 10, 3]
LTB_AT = {(1, 3), (2, 4), (2, 9), (3, 2)}
SR_RATIOS = [8, 4, 2, 1]


def _bn3d(m, fpp, fsp, sd, tp):
    """BatchNorm3d/1d -> params {scale,bias} + batch_stats {mean,var}."""
    _bn(m, fpp, fsp, sd, tp)


def _mhca(m, P, S, base, sd, tp):
    m[P + base + ("mhca", "group_conv", "kernel")] = conv(
        sd, tp + ".mhca.group_conv3x3.weight")
    _bn3d(m, P + base + ("mhca", "norm"), S + base + ("mhca", "norm"),
          sd, tp + ".mhca.norm")
    m[P + base + ("mhca", "projection", "kernel")] = conv(
        sd, tp + ".mhca.projection.weight")


def _lff(m, P, S, base, sd, tp):
    """LocalityFeedForward nn.Sequential: 0 expand conv / 1 BN / 2 h-swish /
    3 dw conv / 4 BN / 5 h-swish / 6 SE / 7 project conv / 8 BN."""
    c = tp + ".conv.conv"
    m[P + base + ("lff", "expand", "kernel")] = conv(sd, c + ".0.weight")
    _bn3d(m, P + base + ("lff", "bn1"), S + base + ("lff", "bn1"), sd, c + ".1")
    m[P + base + ("lff", "dwconv", "kernel")] = conv(sd, c + ".3.weight")
    _bn3d(m, P + base + ("lff", "bn2"), S + base + ("lff", "bn2"), sd, c + ".4")
    _dense(m, P + base + ("lff", "se", "fc1"), sd, c + ".6.fc.0")
    _dense(m, P + base + ("lff", "se", "fc2"), sd, c + ".6.fc.2")
    m[P + base + ("lff", "project", "kernel")] = conv(sd, c + ".7.weight")
    _bn3d(m, P + base + ("lff", "bn3"), S + base + ("lff", "bn3"), sd, c + ".8")


def port_medvit_full(sd):
    P, S = ("params",), ("batch_stats",)
    m = {}
    for i in range(4):
        m[P + (f"stem{i}", "conv", "kernel")] = conv(sd, f"stem.{i}.conv.weight")
        _bn3d(m, P + (f"stem{i}", "norm"), S + (f"stem{i}", "norm"),
              sd, f"stem.{i}.norm")

    f = 0
    for stage, depth in enumerate(DEPTHS):
        for j in range(depth):
            tp = f"features.{f}"
            is_ltb = (stage, j) in LTB_AT
            name = f"s{stage}_b{j}_" + ("ltb" if is_ltb else "ecb")
            base = (name,)

            # patch_embed (identity when in==out and stride 1)
            if tp + ".patch_embed.conv.weight" in sd:
                m[P + base + ("patch_embed", "conv", "kernel")] = conv(
                    sd, tp + ".patch_embed.conv.weight")
                _bn3d(m, P + base + ("patch_embed", "norm"),
                      S + base + ("patch_embed", "norm"),
                      sd, tp + ".patch_embed.norm")

            _bn3d(m, P + base + ("norm1",), S + base + ("norm1",),
                  sd, tp + ".norm1")
            _bn3d(m, P + base + ("norm2",), S + base + ("norm2",),
                  sd, tp + ".norm2")
            _mhca(m, P, S, base, sd, tp)
            _lff(m, P, S, base, sd, tp)

            if is_ltb:
                for lname in ("q", "k", "v", "proj"):
                    _dense(m, P + base + ("e_mhsa", lname), sd,
                           f"{tp}.e_mhsa.{lname}")
                if f"{tp}.e_mhsa.norm.weight" in sd:  # sr_ratio > 1 only
                    _bn3d(m, P + base + ("e_mhsa", "sr_norm"),
                          S + base + ("e_mhsa", "sr_norm"),
                          sd, tp + ".e_mhsa.norm")
                # projection PatchEmbed (mhsa_out -> mhca_out, always 1x1)
                m[P + base + ("projection", "conv", "kernel")] = conv(
                    sd, tp + ".projection.conv.weight")
                _bn3d(m, P + base + ("projection", "norm"),
                      S + base + ("projection", "norm"),
                      sd, tp + ".projection.norm")
            f += 1

    _bn3d(m, P + ("norm",), S + ("norm",), sd, "norm")
    _dense(m, P + ("proj_head",), sd, "proj_head.0")
    return m


def check_medvit(img=(32, 32, 32), report=None):
    import torch

    *_, ref_medvit = import_reference()
    torch.manual_seed(0)
    tm = ref_medvit.MedViTV1S(
        in_channels=1, num_classes=5, attention_dropout=0.0, dropout=0.0,
        mlp_ratio=3.0, use_checkpoint=False, stochastic_depth_prob=0.0,
    ).eval()

    # Mirror configs/medvit-5c-no_seed-baseline.yaml: DEPTH [3,4,10,3],
    # HEADS=32 (head_dim), MLP_RATIO 3 — the reference's S preset.
    overrides = dict(
        ARCHITECTURE="MedViT", IMG_SIZE=list(img), RESHAPE_SIZE=False,
        DEPTH=[3, 4, 10, 3], HEADS=32, MLP_RATIO=3.0,
        STOCHASTIC_DEPTH_PROB=0.0, DROPOUT=0.0,
        ATTENTION_DROPOUT=0.0, FP16=False,
    )
    return _compare("medvit", tm, overrides,
                    lambda sd: port_medvit_full(sd), img, report, f64=True)


if __name__ == "__main__":
    res = []
    check_medvit(report=res)
    sys.exit(0 if res[-1]["pass"] else 1)
