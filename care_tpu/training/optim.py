"""Optimizers and LR schedules (optax).

Parity targets: reference ``models/Wrapper.py:316-386`` (Adam + StepLR /
cosine / linear-warmup / plateau, optional weight-decay filtering) and
``Wrapper.py:460-547`` (the CARE dual-optimizer recipe: after
``lowlr_start_epoch`` a *fresh* Adam takes over with a low LR on the
encoder + concept detector and the base LR elsewhere; both schedules decay
per epoch from step 0).

torch.optim.Adam's ``weight_decay`` is L2-on-gradient (not AdamW), i.e.
``optax.add_decayed_weights`` *before* the Adam moments.
"""

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util


def make_lr_schedule(opt: dict, steps_per_epoch: int,
                     base_lr: Optional[float] = None) -> Callable:
    lr = base_lr if base_lr is not None else opt.get("learning_rate", 5e-4)
    kind = opt.get("lr_scheduler_type", "linear")
    if kind == "linear":  # StepLR per epoch
        decay = opt.get("lr_decay", 0.9)
        step_size = opt.get("lr_step_size", 1)

        def sched(step):
            epoch = step // steps_per_epoch
            return lr * (decay ** (epoch // step_size))
        return sched
    if kind == "cosine":
        total = opt.get("max_steps") or (opt["epochs"] * steps_per_epoch)
        return optax.cosine_decay_schedule(
            lr, total, alpha=opt.get("min_lr", 1e-6) / lr)
    if kind == "linear_with_warmup":
        total = opt.get("max_steps") or (opt["epochs"] * steps_per_epoch)
        if opt.get("learning_rate_warmup_ratio"):
            warmup = int(total * opt["learning_rate_warmup_ratio"])
        else:
            warmup = opt.get("learning_rate_warmup_steps", 1000)
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup),
             optax.linear_schedule(lr, 0.0, max(total - warmup, 1))],
            [warmup])
    # 'plateau' is handled host-side by the trainer scaling a mutable factor
    return lambda step: lr


class PlateauController:
    """Host-side ReduceLROnPlateau (reference ``Wrapper.py:362-376``):
    multiply the injected learning rate by ``factor`` after ``patience``
    epochs without improvement of the monitored metric."""

    def __init__(self, opt: dict):
        self.mode = opt.get("lr_monitor_mode", "max")
        self.metric = opt.get("lr_monitor_metric", "CIDEr")
        self.patience = opt.get("lr_monitor_patience", 1)
        self.factor = opt.get("lr_decay", 0.9)
        self.min_lr = opt.get("min_lr", 1e-6)
        self.best = None
        self.bad_epochs = 0
        self.scale = 1.0

    def update(self, scores: dict) -> float:
        """Feed this epoch's scores; returns the current LR scale."""
        v = scores.get(self.metric)
        if v is None:
            return self.scale
        better = (self.best is None
                  or (v > self.best if self.mode == "max" else v < self.best))
        if better:
            self.best = v
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale *= self.factor
                self.bad_epochs = 0
        return self.scale

    def current_lr(self, base_lr: float) -> float:
        return max(base_lr * self.scale, self.min_lr)


def _decay_mask(params, filter_biases: bool, skip_substr_list=()):
    """True = apply weight decay. Mirrors ``add_weight_decay`` /
    ``filter_weight_decay`` (reference ``misc/utils.py:282-304``): 1-D
    params (biases, LN gains) are excluded when filtering, as are params
    whose path contains any listed substring."""
    flat = traverse_util.flatten_dict(params)
    mask = {}
    for k, v in flat.items():
        keep = v.ndim > 1 if filter_biases else True
        path = "/".join(str(p) for p in k)
        if any(s in path for s in skip_substr_list):
            keep = False
        mask[k] = keep
    return traverse_util.unflatten_dict(mask)


def freeze_mask(params, opt: dict):
    """True = trainable. ``freeze_parameters_except`` freezes everything
    whose path contains none of the given substrings (reference
    ``opts.py:62`` + ``train.py`` weight-freezing flow); frozen pretrained
    word embeddings (reference ``Embeddings.py:96-100``) freeze their own
    table unless ``train_emb``."""
    keep = opt.get("freeze_parameters_except") or []
    frozen_substr = []
    if opt.get("pretrained_embs_path", "") and not opt.get("train_emb",
                                                           False):
        # the caption word-embedding tables only (NOT the concept-slot
        # embeddings inside the SemanticContainer)
        frozen_substr += ["embedding/word_embeddings",
                          "decoder/word_embeddings"]
    if not keep and not frozen_substr:
        return None
    flat = traverse_util.flatten_dict(params)
    mask = {}
    for k in flat:
        path = "/".join(map(str, k))
        trainable = any(s in path for s in keep) if keep else True
        if any(s in path for s in frozen_substr):
            trainable = False
        mask[k] = trainable
    return traverse_util.unflatten_dict(mask)


def make_adam(opt: dict, schedule: Callable, params) -> optax.GradientTransformation:
    wd = opt.get("weight_decay", 0.001)
    chain = []
    fmask = freeze_mask(params, opt)
    if fmask is not None:
        frozen = jax.tree.map(lambda t: not t, fmask)
        chain.append(optax.masked(optax.set_to_zero(), frozen))
    if opt.get("gradient_clip_val", 0.0):
        chain.append(optax.clip_by_global_norm(opt["gradient_clip_val"]))
    if wd:
        if opt.get("filter_weight_decay", False):
            chain.append(optax.masked(
                optax.add_decayed_weights(wd),
                _decay_mask(params, opt.get("filter_biases", False),
                            opt.get("skip_substr_list", []))))
        else:
            chain.append(optax.add_decayed_weights(wd))
    chain.append(optax.scale_by_adam())
    chain.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*chain)


def lowlr_param_labels(params, opt: dict) -> Dict:
    """Label params 'low' (encoder + concept detector) vs 'normal'
    (reference ``Wrapper.py:493-508``)."""
    names = ["encoder", "Predictor_attribute"]
    if opt.get("decoding_type") == "NARFormer":
        names.append("SemanticContainer")

    flat = traverse_util.flatten_dict(params)
    labels = {}
    for k in flat:
        path = "/".join(str(p) for p in k)
        labels[k] = "low" if any(n in path for n in names) else "normal"
    return traverse_util.unflatten_dict(labels)


def make_dual_adam(opt: dict, params, steps_per_epoch: int,
                   offset_steps: int = 0):
    """The post-switch optimizer of the CARE recipe: low LR on encoder +
    concept detector, base LR elsewhere, both with per-epoch StepLR decay
    counted from training step 0 (reference steps both schedulers every
    epoch from the start). ``offset_steps`` accounts for the optimizer being
    freshly initialised at the switch epoch while its scheduler has already
    decayed."""
    low = make_lr_schedule(opt, steps_per_epoch,
                           base_lr=opt.get("low_learning_rate", 5e-5))
    base = make_lr_schedule(opt, steps_per_epoch)
    low_sched = (lambda step: low(step + offset_steps))
    base_sched = (lambda step: base(step + offset_steps))
    labels = lowlr_param_labels(params, opt)
    return optax.multi_transform(
        {"low": make_adam(opt, low_sched, params),
         "normal": make_adam(opt, base_sched, params)},
        labels)
