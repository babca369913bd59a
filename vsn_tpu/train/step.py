"""The jitted train/eval step.

One ``train_step`` call consumes ``grad_accum`` micro-batches and performs one
optimizer step — the functional equivalent of the reference's micro-batch loop
(train/train_transformer.py:1111-1292):

  * gradient accumulation is a ``lax.scan`` over the leading micro-batch axis
    (the reference loops Python-side with DDP ``no_sync``; under a sharded jit
    the cross-device grad psum is emitted by XLA once, after accumulation);
  * globally-synced NaN guard: if the accumulated grads or loss are non-finite
    the whole update is skipped via ``lax.cond`` — every device agrees because
    the decision is computed on replicated values (reference 1139-1189);
  * SAM is two accumulation passes over the *same* micro-batches: perturb by
    rho*g/||g||, recompute grads, update the original params (reference
    1191-1269 caches micro-batches host-side; here the batch is simply still
    in HBM);
  * optional global-norm clipping before the (first and second) SAM passes'
    updates (reference 1198-1216, 1256-1284);
  * EMA update after a successful optimizer step (reference 1294-1296); EMA
    covers params AND mutable model state (BN running stats), matching the
    reference's full-state_dict EMA (utils/ema.py:84-108);
  * LR/WD are read from precomputed schedule tables indexed by the traced
    step counter (reference 279-309).

BatchNorm models (ResNet/MedViT) carry their running statistics as a mutable
``batch_stats`` collection threaded through the accumulation scan. The
reference's SyncBN (train_transformer.py:2089-2090) needs no special code:
under a global-view sharded jit, batch reductions are global, so moments are
computed over the cross-device batch automatically.

bf16 forward/backward with f32 params and f32 grad accumulation replaces the
reference's fp16 + GradScaler; the scaler's NaN machinery reduces to the
plain NaN-skip above.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from vsn_tpu.train import optim
from vsn_tpu.train.ema import EMAState, ema_init, ema_update
from vsn_tpu.train.losses import label_smoothing_loss, smoothing_from_config


class TrainState(NamedTuple):
    params: object               # trainable params (variables['params'])
    model_state: dict            # non-trainable collections (batch_stats, ...)
    opt: optim.AdamWState
    step: jax.Array              # optimizer steps taken (int32)
    skipped: jax.Array           # NaN-skipped steps (int32)
    ema: Optional[EMAState]      # EMA over {params, model_state}; None if off


def split_variables(variables) -> tuple[object, dict]:
    """Split a flax variables dict into (params, other collections)."""
    variables = dict(variables)
    params = variables.pop("params")
    return params, variables


def init_train_state(cfg, variables) -> TrainState:
    params, model_state = split_variables(variables)
    ema = (
        ema_init({"params": params, "model_state": model_state},
                 int(cfg.EMA_N_MODELS))
        if cfg.USE_EMA
        else None
    )
    return TrainState(
        params=params,
        model_state=model_state,
        opt=optim.adamw_init(params),
        step=jnp.zeros((), jnp.int32),
        skipped=jnp.zeros((), jnp.int32),
        ema=ema,
    )


def eval_variables(state: TrainState, use_ema: bool) -> dict:
    """Variables dict for validation/eval: EMA weights when EMA is on
    (reference train_transformer.py:1307-1322 apply_to/restore)."""
    if use_ema and state.ema is not None:
        e = state.ema.ema
        return {"params": e["params"], **e["model_state"]}
    return {"params": state.params, **state.model_state}


def make_loss_fn(model, cfg):
    smoothing = smoothing_from_config(cfg)

    def loss_fn(params, model_state, images, labels, rngs):
        variables = {"params": params, **model_state}
        mutable = list(model_state.keys())
        if mutable:
            logits, new_model_state = model.apply(
                variables, images, False, rngs=rngs, mutable=mutable
            )
        else:
            logits = model.apply(variables, images, False, rngs=rngs)
            new_model_state = model_state
        loss = label_smoothing_loss(logits, labels, smoothing)
        return loss, (logits, dict(new_model_state))

    return loss_fn


def make_batch_transform(cfg):
    """Per-micro-batch device transform: MixUp/CutMix then augmentation.

    The reference applies the MONAI transform after mixing
    (dataset/dataset.py:288-291); same order here, all fused on device.
    """
    from vsn_tpu.data.augment import build_train_augment
    from vsn_tpu.data.mixers import build_mix_fn

    mix_fn = build_mix_fn(cfg)
    aug_fn = build_train_augment(cfg)

    def transform(micro: dict, rng):
        if mix_fn is not None:
            images, labels = mix_fn(micro)
        else:
            images, labels = micro["image"], micro["label"]
        images = aug_fn(images, rng)
        return images, labels

    return transform


def make_train_step(model, cfg, lr_table, wd_table, batch_transform=None,
                    probe_model=None):
    """Build the train step: (state, batch, base_rng) -> (state, metrics).

    ``probe_model`` (optional, WATCH_GRADIENTS diagnostics): an UNFUSED twin
    of ``model`` (identical param tree) whose attention modules sow
    ``attn_logit_max``; one probe forward on the first micro-batch per step
    surfaces the max attention logit, making the fused kernels' softmax
    clamp at 80 (swin_block_kernels.py) observable instead of silent in the
    logit-growth instability regime this project studies.

    ``batch`` is a dict with ``image`` [A, B, D, H, W, C] and ``label``
    [A, B, K] (plus mix fields when MixUp/CutMix is on), A = gradient-
    accumulation factor. Under a mesh, axis 1 (B) is sharded over 'data';
    everything else is replicated. ``batch_transform(micro, rng)`` applies
    on-device mixing/augmentation per micro-batch (see make_batch_transform);
    None means raw (image, label) passthrough.

    Device-resident mode (PRELOAD_DEVICE): the batch instead carries
    ``image_idx``/``partner_idx`` [A, B] int32 and the returned step takes a
    ResidentVolumes store as its 4th argument; volumes are gathered on device
    (vsn_tpu/data/resident.py).
    """
    loss_fn = make_loss_fn(model, cfg)
    if batch_transform is None:
        batch_transform = lambda micro, rng: (micro["image"], micro["label"])
    use_sam = bool(cfg.USE_SAM)
    sam_rho = float(cfg.SAM_RHO)
    sam_adaptive = bool(cfg.SAM_ADAPTIVE)
    clip = cfg.get("GRADIENT_CLIP", False)
    clip = float(clip) if clip else None
    use_ema = bool(cfg.USE_EMA)
    ema_decay = float(cfg.EMA_DECAY)
    ema_n = int(cfg.EMA_N_MODELS)
    lr_table = jnp.asarray(lr_table, jnp.float32)
    wd_table = jnp.asarray(wd_table, jnp.float32)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    compute_dtype = jnp.bfloat16 if cfg.get("FP16", True) else jnp.float32

    def accumulate(params, model_state, batch, step_rng, pass_idx,
                   resident=None):
        """Mean loss/grads over the micro-batch axis via scan.

        The mix + augmentation transform runs INSIDE the scan body with a
        data RNG that does not depend on ``pass_idx``, so the SAM second
        pass recomputes bit-identical micro-batches — the memory-lean
        equivalent of the reference's host-side micro-batch caching
        (train_transformer.py:1223-1243). Materializing the transformed
        step batch once (the previous design) keeps an extra
        [A, B, D, H, W, C] buffer live across both SAM passes; at
        effective-batch 128 with MixUp + EMA that ~890 MB tipped the full
        stabilization config over v5e HBM and the step fell off an 18x
        paging cliff (see BASELINE.md, regression postmortem).

        BN stats update sequentially across micro-batches, like the
        reference's sequential micro-batch forwards; dropout streams differ
        between the two SAM passes.

        ``resident`` is an optional ResidentVolumes store: when the batch
        carries image_idx/partner_idx instead of voxel data, volumes are
        gathered on device per micro-batch (vsn_tpu/data/resident.py).
        """
        from vsn_tpu.data.resident import resolve_micro

        a = batch["label"].shape[0]

        def body(carry, xs):
            acc_loss, acc_grads, mstate = carry
            micro, idx = xs
            micro = resolve_micro(micro, resident)
            data_rng = jax.random.fold_in(
                jax.random.fold_in(step_rng, 999), idx
            )
            img, lab = batch_transform(micro, data_rng)
            img = img.astype(compute_dtype)
            rng = jax.random.fold_in(step_rng, idx * 2 + pass_idx)
            rngs = {
                "dropout": jax.random.fold_in(rng, 0),
                "shakedrop": jax.random.fold_in(rng, 1),
            }
            (loss, (_, new_mstate)), grads = grad_fn(
                params, mstate, img, lab, rngs
            )
            acc_loss = acc_loss + loss
            acc_grads = jax.tree.map(
                lambda ag, g: ag + g.astype(jnp.float32), acc_grads, grads
            )
            return (acc_loss, acc_grads, new_mstate), None

        zero_grads = jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params
        )
        (tot_loss, tot_grads, new_mstate), _ = jax.lax.scan(
            body,
            (jnp.zeros((), jnp.float32), zero_grads, model_state),
            (batch, jnp.arange(a)),
        )
        inv = 1.0 / a
        return tot_loss * inv, optim.tree_scale(tot_grads, inv), new_mstate

    def train_step(state: TrainState, batch, base_rng, resident=None):
        step = state.step
        lr = lr_table[jnp.minimum(step, lr_table.shape[0] - 1)]
        wd = wd_table[jnp.minimum(step, wd_table.shape[0] - 1)]
        step_rng = jax.random.fold_in(base_rng, step)

        loss, grads, mstate = accumulate(
            state.params, state.model_state, batch, step_rng, 0, resident
        )
        finite = optim.all_finite(grads) & jnp.isfinite(loss)

        if clip is not None:
            grads, grad_norm = optim.clip_by_global_norm(grads, clip)
        else:
            grad_norm = optim.global_norm(grads)

        if use_sam:
            e_w, _ = optim.sam_perturbation(
                state.params, grads, sam_rho, sam_adaptive
            )
            params_adv = optim.tree_add(state.params, e_w)
            loss2, grads2, mstate = accumulate(
                params_adv, mstate, batch, step_rng, 1, resident
            )
            finite = finite & optim.all_finite(grads2) & jnp.isfinite(loss2)
            if clip is not None:
                grads2, _ = optim.clip_by_global_norm(grads2, clip)
            update_grads = grads2
        else:
            update_grads = grads

        def do_update(operand):
            params, old_mstate, opt, ema = operand
            new_params, new_opt = optim.adamw_update(
                update_grads, opt, params, lr, wd
            )
            if use_ema:
                ema = ema_update(
                    ema, {"params": new_params, "model_state": mstate},
                    ema_decay, ema_n,
                )
            return new_params, mstate, new_opt, ema, jnp.int32(0)

        def skip_update(operand):
            params, old_mstate, opt, ema = operand
            return params, old_mstate, opt, ema, jnp.int32(1)

        new_params, new_mstate, new_opt, new_ema, was_skipped = jax.lax.cond(
            finite, do_update, skip_update,
            (state.params, state.model_state, state.opt, state.ema),
        )

        new_state = TrainState(
            params=new_params,
            model_state=new_mstate,
            opt=new_opt,
            step=step + 1,
            skipped=state.skipped + was_skipped,
            ema=new_ema,
        )
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "lr": lr,
            "wd": wd,
            "skipped": was_skipped,
        }
        if cfg.get("WATCH_GRADIENTS", False):
            # gradient watching (reference w.watch(log="gradients"),
            # train_transformer.py:2112-2120): per-top-level-module gradient
            # norms ride in the metric dict — static keys, a few scalar
            # reductions on device
            for mod_name, sub in grads.items():
                metrics[f"grad_norm/{mod_name}"] = optim.global_norm(sub)
            if probe_model is not None:
                from vsn_tpu.data.resident import resolve_micro

                # The probe forward is only consumed on logged steps
                # (trainer logs every VALIDATION_FREQUENCY); lax.cond skips
                # the extra forward's runtime cost on all other steps
                # (returns -inf, filtered out by the trainer's row builder).
                log_every = max(1, int(cfg.get("VALIDATION_FREQUENCY", 1)))

                def probe_branch(_):
                    micro0 = jax.tree.map(lambda t: t[0], batch)
                    micro0 = resolve_micro(micro0, resident)
                    data_rng = jax.random.fold_in(
                        jax.random.fold_in(step_rng, 999), 0
                    )
                    img, _ = batch_transform(micro0, data_rng)
                    _, inter = probe_model.apply(
                        {"params": state.params, **state.model_state},
                        img.astype(compute_dtype), True,
                        mutable=["intermediates"],
                    )
                    sown = [
                        jnp.max(leaf).astype(jnp.float32)
                        for leaf in jax.tree.leaves(inter)
                    ]
                    if not sown:
                        return jnp.float32(-jnp.inf)
                    return jnp.max(jnp.stack(sown))

                metrics["attn_logit_max"] = jax.lax.cond(
                    (step + 1) % log_every == 0,
                    probe_branch,
                    lambda _: jnp.float32(-jnp.inf),
                    operand=None,
                )
        return new_state, metrics

    return train_step


def make_eval_step(model):
    """(variables, images) -> probs [B, K] (deterministic forward + softmax)."""

    def eval_step(variables, images):
        logits = model.apply(variables, images, True)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    return eval_step


def make_bn_refresh_step(model, cfg, batch_transform=None):
    """Re-estimate BN running stats with (EMA) weights over train batches.

    Equivalent of reference EMAModel.update_bn_stats (utils/ema.py:144-178):
    train-mode forwards that only mutate batch_stats.
    """
    if batch_transform is None:
        batch_transform = lambda micro, rng: (micro["image"], micro["label"])

    def refresh(params, model_state, batch, rng, resident=None):
        from vsn_tpu.data.resident import resolve_micro

        a = batch["label"].shape[0]

        def body(mstate, xs):
            micro, idx = xs
            micro = resolve_micro(micro, resident)
            images, _ = batch_transform(micro, jax.random.fold_in(rng, idx))
            _, new_mstate = model.apply(
                {"params": params, **mstate}, images, False,
                rngs={"dropout": jax.random.fold_in(rng, idx + 1000),
                      "shakedrop": jax.random.fold_in(rng, idx + 2000)},
                mutable=list(mstate.keys()),
            )
            return dict(new_mstate), None

        new_mstate, _ = jax.lax.scan(body, model_state, (batch, jnp.arange(a)))
        return new_mstate

    return refresh
