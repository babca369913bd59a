"""Golden cross-framework parity: the torch reference as oracle.

Four rounds of parity gates compared JAX-vs-JAX (fused vs unfused, packed
vs padded). This harness is the only test that validates vsn_tpu against
the thing it claims parity with: it instantiates the REFERENCE models
(/root/reference, torch 2.13 CPU — forwards run fine on this host; only
CUDA training does not), ports their state_dicts into vsn_tpu param trees,
and asserts that forward logits and parameter gradients agree.

The JAX side runs the UNFUSED XLA path (USE_PALLAS_ATTENTION=False) in
f32: the fused Pallas kernels are tied to that path by the existing
fused-vs-unfused gates (tests/test_swin_block_kernels.py and the on-chip
tpu_parity_probe), so agreement here + those gates = agreement end to end.

Reference oracles:
  models/swin_transformer_3d.py  (SwinTransformer)
  models/vit_3d.py               (ViT)
  models/resnet_3d.py            (ResNet3DMedical)
  models/medvit_3d.py            (MedViTV1)

timm is absent from this environment; the reference models need exactly
DropPath / to_3tuple / trunc_normal_ from timm.layers, shimmed below from
torch primitives (identity at p=0 / eval; the comparison runs in eval
mode so DropPath never fires).

Deviation measurement (--deviations): DEVIATIONS.md rows 1-2 claim the
only output-visible behavior differences. This mode MEASURES them:
  #1 pad-token masking — compare reference vs vsn_tpu at a NON-divisible
     Swin geometry (reference lets boundary windows attend zero-pad
     tokens; vsn_tpu masks them) and report the logit delta.
  #2 -100 vs -1e9 mask — softmax leakage of a -100 additive mask on
     random logits, the bound the fused kernels' -1e9 removes.

Usage:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/golden_parity.py \
      [--arch swin|vit|resnet|medvit|all] [--deviations]
"""

from __future__ import annotations

import argparse
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE = os.environ.get("VSN_REFERENCE_DIR", "/root/reference")

FWD_TOL = 2e-4   # max |logit delta|, f32 end to end at small geometry
GRAD_TOL = 5e-4  # max per-leaf grad delta relative to that leaf's scale


# --------------------------------------------------------------------------
# timm shim: the reference imports DropPath / to_3tuple / trunc_normal_
# --------------------------------------------------------------------------

def install_timm_shim():
    import torch
    import torch.nn as nn

    if "timm" in sys.modules:
        return

    class DropPath(nn.Module):
        """Stochastic depth (timm). Identity in eval mode / at p=0 — the
        only regimes this harness runs."""

        def __init__(self, drop_prob: float = 0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
            return x * mask / keep

    def to_3tuple(x):
        if isinstance(x, (tuple, list)):
            assert len(x) == 3
            return tuple(x)
        return (x, x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            return nn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b)

    timm = types.ModuleType("timm")
    layers = types.ModuleType("timm.layers")
    layers.DropPath = DropPath
    layers.to_3tuple = to_3tuple
    layers.trunc_normal_ = trunc_normal_
    timm.layers = layers
    sys.modules["timm"] = timm
    sys.modules["timm.layers"] = layers


def import_reference():
    install_timm_shim()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    # The reference's utils/__init__ imports monai/pandas/sklearn-heavy
    # modules the model files never touch. Register stub packages whose
    # __path__ points into the reference so `utils.stable_init` et al.
    # load as plain files WITHOUT executing the package __init__.
    for pkg in ("utils", "regularization"):
        if pkg not in sys.modules:
            mod = types.ModuleType(pkg)
            mod.__path__ = [os.path.join(REFERENCE, pkg)]
            sys.modules[pkg] = mod
    import models.swin_transformer_3d as ref_swin  # noqa: F401
    import models.vit_3d as ref_vit  # noqa: F401
    import models.resnet_3d as ref_resnet  # noqa: F401
    import models.medvit_3d as ref_medvit  # noqa: F401
    return ref_swin, ref_vit, ref_resnet, ref_medvit


# --------------------------------------------------------------------------
# state_dict -> flax tree porting
# --------------------------------------------------------------------------

def t2n(t):
    return t.detach().cpu().numpy()


def lin(sd, key):
    """torch Linear -> flax Dense: weight [out,in] -> kernel [in,out]."""
    return t2n(sd[key]).T


def conv(sd, key):
    """torch Conv3d [O,I,kd,kh,kw] -> flax [kd,kh,kw,I,O]."""
    return t2n(sd[key]).transpose(2, 3, 4, 1, 0)


def set_tree(tree, mapping):
    """Replace every leaf of ``tree`` via ``mapping[path] -> np.ndarray``;
    error on any leaf not covered or any mapping entry unused (full
    bidirectional coverage is the point of the golden test)."""
    import jax.tree_util as jtu

    used = set()

    def visit(path, leaf):
        key = tuple(getattr(p, "key", getattr(p, "idx", None)) for p in path)
        if key not in mapping:
            raise KeyError(f"no torch mapping for flax leaf {key}")
        used.add(key)
        arr = np.asarray(mapping[key], dtype=np.asarray(leaf).dtype)
        if arr.shape != leaf.shape:
            raise ValueError(f"{key}: torch {arr.shape} != flax {leaf.shape}")
        return arr

    out = jtu.tree_map_with_path(visit, tree)
    unused = set(mapping) - used
    if unused:
        raise KeyError(f"unused torch mappings: {sorted(unused)[:8]}")
    return out


def _ln(mapping, flax_prefix, sd, torch_prefix):
    mapping[flax_prefix + ("scale",)] = t2n(sd[torch_prefix + ".weight"])
    mapping[flax_prefix + ("bias",)] = t2n(sd[torch_prefix + ".bias"])


def _dense(mapping, flax_prefix, sd, torch_prefix, bias=True):
    mapping[flax_prefix + ("kernel",)] = lin(sd, torch_prefix + ".weight")
    if bias:
        mapping[flax_prefix + ("bias",)] = t2n(sd[torch_prefix + ".bias"])


def _bn(mapping, flax_params_prefix, flax_stats_prefix, sd, torch_prefix):
    _ln(mapping, flax_params_prefix, sd, torch_prefix)
    mapping[flax_stats_prefix + ("mean",)] = t2n(
        sd[torch_prefix + ".running_mean"])
    mapping[flax_stats_prefix + ("var",)] = t2n(
        sd[torch_prefix + ".running_var"])


# --------------------------------------------------------------------------
# Swin
# --------------------------------------------------------------------------

def port_swin(sd, depths):
    P = ("params",)
    m = {}
    m[P + ("patch_embed", "kernel")] = conv(sd, "backbone.patch_embed.proj.weight")
    m[P + ("patch_embed", "bias")] = t2n(sd["backbone.patch_embed.proj.bias"])
    _ln(m, P + ("patch_embed_norm",), sd, "backbone.patch_embed.norm")
    for i, depth in enumerate(depths):
        for j in range(depth):
            tp = f"backbone.layers.{i}.blocks.{j}"
            fp = P + (f"layer{i}", f"block{j}")
            _ln(m, fp + ("norm1",), sd, tp + ".norm1")
            _ln(m, fp + ("norm2",), sd, tp + ".norm2")
            _dense(m, fp + ("attn", "qkv"), sd, tp + ".attn.qkv")
            _dense(m, fp + ("attn", "proj"), sd, tp + ".attn.proj")
            m[fp + ("attn", "relative_position_bias_table")] = t2n(
                sd[tp + ".attn.relative_position_bias_table"])
            _dense(m, fp + ("mlp", "fc1"), sd, tp + ".mlp.0")
            _dense(m, fp + ("mlp", "fc2"), sd, tp + ".mlp.3")
        if i < len(depths) - 1:
            tp = f"backbone.layers.{i}.downsample"
            fp = P + (f"layer{i}", "downsample")
            _ln(m, fp + ("norm",), sd, tp + ".norm")
            _dense(m, fp + ("reduction",), sd, tp + ".reduction", bias=False)
    _ln(m, P + ("norm",), sd, "backbone.norm")
    _dense(m, P + ("head",), sd, "head")
    return m


def check_swin(img=(128, 128, 128), window=(4, 4, 4), depths=None, heads=None,
               batch=1, report=None):
    """Swin-T-shaped 4-stage model, depth 2 per stage so shifted blocks run.

    Default geometry (128^3, patch 2, window 4 -> stage dims 64/32/16/8)
    keeps every stage divisible by the window AND strictly larger than it:
    the reference never clamps windows or shifts (its
    get_window_size_and_shift at swin_transformer_3d.py:92-103 is DEAD CODE
    — BasicLayer always pads up to the full window and keeps rolling
    shifted blocks even when a stage dim <= window), while vsn_tpu clamps
    (swin3d.py clamp_window, the upstream video-Swin behavior). At stage
    dims <= window the two therefore differ in behavior and — below the
    window — in bias-table SHAPE. See DEVIATIONS.md #12."""
    import torch
    import torch.nn as nn

    ref_swin, *_ = import_reference()
    depths = depths or [2, 2, 2, 2]
    heads = heads or [2, 4, 2, 4][: len(depths)]
    torch.manual_seed(0)
    tm = ref_swin.SwinTransformer(
        patch_size=[2, 2, 2], in_channels=1, num_classes=5, embed_dim=24,
        depths=depths, num_heads=heads, window_size=list(window),
        mlp_ratio=4.0, qkv_bias=True, dropout=0.0, attention_dropout=0.0,
        stochastic_depth_prob=0.0, norm_layer=nn.LayerNorm,
    ).eval()

    overrides = dict(
        ARCHITECTURE="Swin", IMG_SIZE=list(img), RESHAPE_SIZE=False,
        PATCH_SHAPE=[2, 2, 2], EMBED_DIM=24, DEPTH=depths, HEADS=heads,
        WINDOW_SIZE=list(window), STOCHASTIC_DEPTH_PROB=0.0, DROPOUT=0.0,
        ATTENTION_DROPOUT=0.0, USE_PALLAS_ATTENTION=False, FP16=False,
    )
    return _compare("swin", tm, overrides,
                    lambda sd: port_swin(sd, depths), img, report,
                    batch=batch)


# --------------------------------------------------------------------------
# ViT
# --------------------------------------------------------------------------

def port_vit(sd, depth):
    P = ("params",)
    m = {}
    _ln(m, P + ("patch_norm1",), sd, "to_patch_embedding.1")
    _dense(m, P + ("patch_proj",), sd, "to_patch_embedding.2")
    _ln(m, P + ("patch_norm2",), sd, "to_patch_embedding.3")
    m[P + ("pos_embedding",)] = t2n(sd["pos_embedding"])
    m[P + ("cls_token",)] = t2n(sd["cls_token"])
    for i in range(depth):
        tp = f"transformer.layers.{i}"
        fp = P + (f"block{i}",)
        _ln(m, fp + ("attn", "norm"), sd, tp + ".0.norm")
        _dense(m, fp + ("attn", "qkv"), sd, tp + ".0.to_qkv", bias=False)
        _dense(m, fp + ("attn", "proj"), sd, tp + ".0.to_out.0")
        _ln(m, fp + ("ff_prenorm",), sd, tp + ".1.net.0")
        _dense(m, fp + ("mlp", "fc1"), sd, tp + ".1.net.1")
        _dense(m, fp + ("mlp", "fc2"), sd, tp + ".1.net.4")
    _ln(m, P + ("head_norm",), sd, "mlp_head.0")
    _dense(m, P + ("head",), sd, "mlp_head.1")
    return m


def check_vit(img=(16, 16, 16), report=None):
    import torch

    _, ref_vit, *_ = import_reference()
    depth = 2
    torch.manual_seed(0)
    # The protocol pins dim_head=64 and mlp_dim=EMBED_DIM*MLP_RATIO on both
    # sides (reference train_transformer.py:2024-2056; vsn_tpu
    # vit_from_config) — only EMBED_DIM/DEPTH/HEADS/MLP_RATIO are free.
    tm = ref_vit.ViT(
        img_size=tuple(img), patch_size=(4, 4, 4), num_classes=5,
        embed_dim=32, depth=depth, num_heads=2, mlp_dim=64, pool="cls",
        in_channels=1, dim_head=64, dropout=0.0, attention_dropout=0.0,
        stochastic_depth_prob=0.0,
    ).eval()

    overrides = dict(
        ARCHITECTURE="ViT", IMG_SIZE=list(img), RESHAPE_SIZE=False,
        PATCH_SHAPE=[4, 4, 4], EMBED_DIM=32, DEPTH=depth, HEADS=2,
        MLP_RATIO=2.0, STOCHASTIC_DEPTH_PROB=0.0,
        DROPOUT=0.0, ATTENTION_DROPOUT=0.0, USE_PALLAS_ATTENTION=False,
        FP16=False,
    )
    return _compare("vit", tm, overrides,
                    lambda sd: port_vit(sd, depth), img, report)


# --------------------------------------------------------------------------
# ResNet
# --------------------------------------------------------------------------

def port_resnet(sd, layers):
    P, S = ("params",), ("batch_stats",)
    m = {}
    m[P + ("conv1", "kernel")] = conv(sd, "resnet.conv1.weight")
    _bn(m, P + ("bn1",), S + ("bn1",), sd, "resnet.bn1")
    for li, blocks in enumerate(layers, start=1):
        for j in range(blocks):
            tp = f"resnet.layer{li}.{j}"
            name = f"layer{li}_block{j}"
            for c in ("conv1", "conv2"):
                m[P + (name, c, "kernel")] = conv(sd, f"{tp}.{c}.weight")
            for b in ("bn1", "bn2"):
                _bn(m, P + (name, b), S + (name, b), sd, f"{tp}.{b}")
            if f"{tp}.downsample.0.weight" in sd:
                m[P + (name, "downsample_conv", "kernel")] = conv(
                    sd, f"{tp}.downsample.0.weight")
                _bn(m, P + (name, "downsample_bn"),
                    S + (name, "downsample_bn"), sd, f"{tp}.downsample.1")
    _dense(m, P + ("fc",), sd, "resnet.fc")
    return m


def check_resnet(img=(32, 32, 32), report=None):
    import torch

    *_, ref_resnet, _ = import_reference()
    torch.manual_seed(0)
    tm = ref_resnet.ResNet3DMedical(
        img_size=tuple(img), num_classes=5, in_channels=1,
        resnet_variant="resnet18", shortcut_type="B", dropout=0.0,
    ).eval()

    overrides = dict(
        ARCHITECTURE="ResNet", IMG_SIZE=list(img), RESHAPE_SIZE=False,
        RESNET_VARIANT="resnet18", SHORTCUT_TYPE="B", DROPOUT=0.0,
        FP16=False,
    )
    return _compare("resnet", tm, overrides,
                    lambda sd: port_resnet(sd, [2, 2, 2, 2]), img, report,
                    f64=True)


# --------------------------------------------------------------------------
# shared compare
# --------------------------------------------------------------------------

def _compare(name, torch_model, overrides, port_fn, img, report, batch=2,
             f64=False):
    import torch

    import jax
    import jax.numpy as jnp

    from vsn_tpu.config import load_config
    from vsn_tpu.models import build_model

    # f64: BatchNorm architectures at random init have identity running
    # stats (mean 0 / var 1 — no normalization), so f32 grad comparison is
    # ill-conditioned: both frameworks' f32 backward accumulations diverge
    # by ~1e-2 rel from the f64 truth (measured; each agrees with the other
    # in f64 to ~1e-6). Running the oracle comparison in f64 proves the
    # SEMANTICS are identical; the f32 production path is then covered by
    # the forward check + the framework's own numerics tests.
    np_dtype = np.float64 if f64 else np.float32
    if f64:
        jax.config.update("jax_enable_x64", True)
        torch_model = torch_model.double()
        overrides = dict(overrides, FP64=True)
    try:
        return _compare_inner(name, torch_model, overrides, port_fn, img,
                              report, batch, f64, np_dtype)
    finally:
        # x64 is a GLOBAL flag: leaking it poisons every later jit in the
        # process (Python ints become int64 — Pallas index maps and optax
        # comparisons fail; 27 kernel tests broke when the full suite ran
        # these checks before them, 2026-08-20).
        if f64:
            jax.config.update("jax_enable_x64", False)


def _compare_inner(name, torch_model, overrides, port_fn, img, report,
                   batch, f64, np_dtype):
    import torch

    import jax
    import jax.numpy as jnp

    from vsn_tpu.config import load_config
    from vsn_tpu.models import build_model

    cfg = load_config(extra_overrides=overrides)
    jm = build_model(cfg)
    rng = np.random.default_rng(42)
    x = rng.normal(size=(batch, *img, 1)).astype(np_dtype)

    # torch forward (NCDHW)
    tx = torch.from_numpy(x.transpose(0, 4, 1, 2, 3)).requires_grad_(False)
    with torch.no_grad():
        ref_logits = torch_model(tx).numpy()

    # port weights
    variables = jm.init(jax.random.key(0), jnp.asarray(x[:1]), False)
    import flax
    tree = flax.core.unfreeze(variables) if hasattr(variables, "unfreeze") \
        else dict(variables)
    ported = set_tree(tree, port_fn(torch_model.state_dict()))

    logits = np.asarray(jm.apply(ported, jnp.asarray(x), True))
    fwd_diff = float(np.max(np.abs(logits - ref_logits)))
    scale = float(np.max(np.abs(ref_logits)) + 1e-8)

    # gradients of a fixed scalar projection of the logits
    w = rng.normal(size=ref_logits.shape).astype(np_dtype)

    for p in torch_model.parameters():
        p.requires_grad_(True)
    tlogits = torch_model(tx)
    (tlogits * torch.from_numpy(w)).sum().backward()
    grad_sd = {k: p.grad for k, p in torch_model.named_parameters()
               if p.grad is not None}
    # Reuse the weight mapping for the grads: feed port_fn a state_dict-like
    # of grads (zeros for buffers such as running stats, which have none).
    sd = torch_model.state_dict()
    grad_like = {k: (grad_sd[k] if k in grad_sd else torch.zeros_like(v))
                 for k, v in sd.items()}
    grad_full = port_fn(grad_like)

    def jax_loss(params_tree):
        vars_in = dict(ported)
        vars_in["params"] = params_tree
        out = jm.apply(vars_in, jnp.asarray(x), True)
        return (out * jnp.asarray(w)).sum()

    jgrads = jax.grad(jax_loss)(ported["params"])

    import jax.tree_util as jtu

    leaves = []
    for path, leaf in jtu.tree_leaves_with_path(jgrads):
        key = ("params",) + tuple(
            getattr(p, "key", getattr(p, "idx", None)) for p in path)
        leaves.append((key, np.asarray(grad_full[key], dtype=np_dtype),
                       np.asarray(leaf, dtype=np_dtype)))
    # Per-leaf relative error with a floor of 1e-4 x the global gradient
    # scale: some leaves have MATHEMATICALLY ZERO gradients (e.g. E-MHSA
    # k.bias — softmax is invariant to a constant added to every key
    # logit), where both frameworks return pure float dust and a naive
    # per-leaf relative metric explodes on ~1e-9 noise.
    global_scale = max(float(np.max(np.abs(rg))) for _, rg, _ in leaves)
    worst = (0.0, None)
    grad_rows = []
    for key, ref_g, g in leaves:
        denom = max(float(np.max(np.abs(ref_g))), 1e-4 * global_scale, 1e-12)
        rel = float(np.max(np.abs(g - ref_g))) / denom
        grad_rows.append((rel, key))
        if rel > worst[0]:
            worst = (rel, key)

    fwd_tol, grad_tol = (1e-5, 1e-4) if f64 else (FWD_TOL, GRAD_TOL)
    res = {
        "arch": name,
        "fwd_max_abs_diff": fwd_diff,
        "fwd_logit_scale": scale,
        "grad_worst_rel": worst[0],
        "grad_worst_leaf": "/".join(map(str, worst[1] or ())),
        "n_grad_leaves": len(grad_rows),
        "dtype": "f64" if f64 else "f32",
        "pass": fwd_diff <= fwd_tol and worst[0] <= grad_tol,
    }
    print(f"[{name}] fwd max|Δ| {fwd_diff:.3e} (logit scale {scale:.2f})  "
          f"grad worst rel {worst[0]:.3e} @ {res['grad_worst_leaf']}  "
          f"{'PASS' if res['pass'] else 'FAIL'}", flush=True)
    if report is not None:
        report.append(res)
    return res


# --------------------------------------------------------------------------
# Deviation measurements (DEVIATIONS.md #1, #2)
# --------------------------------------------------------------------------

def measure_deviations():
    """#1: reference-vs-vsn_tpu logit delta at a NON-divisible Swin stage
    (pad tokens attended by the reference, masked by vsn_tpu). #2: softmax
    leakage of a -100 additive mask."""
    res = []
    # Non-divisible: img 36 -> stage dims 18 / 9, window 4 pads to 20 / 12
    # (reference swin_transformer_3d.py:457-460 zero-pads, masks only
    # shifted blocks). Two stages only: deeper stages would drop below the
    # window, where vsn_tpu's clamped windows change param SHAPES and no
    # direct port exists.
    check_swin(img=(36, 36, 36), window=(4, 4, 4), depths=[2, 2],
               heads=[2, 4], report=res)
    dev1 = res[-1]
    print(f"[deviation#1] pad-token masking: max logit delta "
          f"{dev1['fwd_max_abs_diff']:.3e} at logit scale "
          f"{dev1['fwd_logit_scale']:.2f} (divisible-geometry floor: run "
          f"--arch swin for the ~1e-5 baseline)", flush=True)

    rng = np.random.default_rng(0)
    logits = rng.normal(scale=3.0, size=(64, 64)).astype(np.float32)
    mask = rng.random((64, 64)) < 0.3

    def softmax(z):
        z = z - z.max(-1, keepdims=True)
        e = np.exp(z)
        return e / e.sum(-1, keepdims=True)

    p100 = softmax(np.where(mask, logits - 100.0, logits))
    pinf = softmax(np.where(mask, logits - 1e9, logits))
    dev2 = float(np.max(np.abs(p100 - pinf)))
    print(f"[deviation#2] -100 vs -1e9 mask: max prob delta {dev2:.3e} "
          f"(leaked mass per masked key <= e^-100 ~ 3.7e-44; below f32 "
          f"resolution)", flush=True)
    return dev1["fwd_max_abs_diff"], dev2


# --------------------------------------------------------------------------

CHECKS = {
    "swin": check_swin,
    "vit": check_vit,
    "resnet": check_resnet,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="all",
                    choices=[*CHECKS, "medvit", "all"])
    ap.add_argument("--deviations", action="store_true")
    args = ap.parse_args()

    if args.deviations:
        measure_deviations()
        return

    report = []
    if args.arch == "medvit" or args.arch == "all":
        from scripts.golden_parity_medvit import check_medvit
    names = list(CHECKS) + ["medvit"] if args.arch == "all" else [args.arch]
    for n in names:
        if n == "medvit":
            check_medvit(report=report)
        else:
            CHECKS[n](report=report)
    failed = [r["arch"] for r in report if not r["pass"]]
    if failed:
        print(f"GOLDEN PARITY FAILED: {failed}", flush=True)
        sys.exit(1)
    print("GOLDEN PARITY OK", flush=True)


if __name__ == "__main__":
    main()
