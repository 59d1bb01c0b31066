"""Loss / criterion system.

Parity targets: reference ``misc/Crit/`` —

* ``LanguageGeneration`` (``crit_lang.py:9-115``): NLL with label smoothing
  on log-softmax (or on pointer ``probs``), stripping of the G-LSG
  concept-prefix positions from the logits, dual-weighted visual-word
  generation, word-accuracy + perplexity recorders;
* ``NoisyOrMIL`` (``crit_attribute.py:14-110``): BCE on noisy-OR concept
  probabilities normalised by #positives (clamped to [0.01, 0.99]),
  sparse-sampling L1 regulariser, F1@{5..50} + mAP recorders;
* ``NoisyOrMILWithEmbs``: re-applies the shared projection to decoder-side
  embeddings (flag->output-key map from ``prepare.py:22-29``);
* ``KLDivLoss`` (``crit_length.py``) for length prediction;
* the ``Criterion`` aggregator with named scales and AverageMeter-style
  epoch statistics.

Everything is a pure function of (model outputs, batch) so the whole loss
grid jit-compiles into the training step; metric recorders come back as
(sum, count) pairs accumulated host-side.
"""

from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from care_tpu import constants

# decoder-output key consumed by each NoisyOrMILWithEmbs flag
ATTR_FLAG_TO_KEY = {
    "P": "input_embs_exclude_bos",
    "I": "input_embs",
    "C": "context",
    "H": "hidden_states",
    "T": "text_context",
    "S": "sentence_embs",
    "A": "attr_embs",
}


def _as_list(x):
    return x if isinstance(x, (list, tuple)) else [x]


# ---------------------------------------------------------------------------
# language generation
# ---------------------------------------------------------------------------

def _lang_step(opt, logits, labels, probs=None):
    """One (logits, labels) pair -> (sum-loss, metrics)."""
    if probs is not None:
        logits = probs

    use_attr = opt.get("use_attr", False)
    t = opt.get("use_attr_type") or ""
    if use_attr and "prefix" in t:
        assert logits.shape[1] == labels.shape[1] + opt["use_attr_topk"]
        logits = logits[:, opt["use_attr_topk"]:, :]
    elif use_attr and "pp" in t:
        assert logits.shape[1] == labels.shape[1] + 1
        logits = logits[:, 1:, :]
    elif logits.shape[1] == labels.shape[1] + 1:
        logits = logits[:, :-1, :]
    else:
        assert logits.shape[1] == labels.shape[1], \
            (logits.shape, labels.shape)

    if probs is not None:
        logprobs = jnp.log(logits + 1e-6)
    else:
        logprobs = jax.nn.log_softmax(logits, axis=-1)

    label_smoothing = opt.get("label_smoothing", 0.0)
    nll = -jnp.take_along_axis(logprobs, labels[:, :, None], axis=2)[:, :, 0]
    smooth = -logprobs.mean(axis=-1)
    loss = (1.0 - label_smoothing) * nll + label_smoothing * smooth

    mask = (labels != constants.PAD).astype(jnp.float32)
    loss_sum = jnp.sum(loss * mask)

    # word accuracy / perplexity recorders
    preds = jnp.argmax(logprobs, axis=-1)
    correct = ((preds == labels) & (labels != constants.PAD))
    metrics = {
        "word_acc_num": jnp.sum(correct.astype(jnp.float32)),
        "word_acc_den": jnp.sum(mask),
        "xent_sum": jnp.sum(nll * mask),
        "xent_count": jnp.sum(mask),
    }
    return loss_sum, metrics


def _lang_step_fused(opt, hidden, kernel, labels):
    """Fused-xent variant of ``_lang_step`` (ops/fused_xent.py): the
    criterion's four statistics stream from (hidden, head kernel) in
    vocab chunks, so the [B, L, V] logits never materialise — same
    position slicing, loss algebra and recorder metrics."""
    from care_tpu.ops.fused_xent import vocab_xent_stats

    use_attr = opt.get("use_attr", False)
    t = opt.get("use_attr_type") or ""
    if use_attr and "prefix" in t:
        assert hidden.shape[1] == labels.shape[1] + opt["use_attr_topk"]
        hidden = hidden[:, opt["use_attr_topk"]:, :]
    elif use_attr and "pp" in t:
        assert hidden.shape[1] == labels.shape[1] + 1
        hidden = hidden[:, 1:, :]
    elif hidden.shape[1] == labels.shape[1] + 1:
        hidden = hidden[:, :-1, :]
    else:
        assert hidden.shape[1] == labels.shape[1], \
            (hidden.shape, labels.shape)

    V = kernel.shape[1]
    lse, lab, tot, amax = vocab_xent_stats(
        hidden, kernel, None, labels, opt.get("fused_xent_chunk", 1024),
        backend=str(opt.get("fused_xent_backend", "auto")))
    # log_softmax identities: nll = lse - label_logit;
    # -mean(logprobs) = lse - sum(logits)/V; argmax(logits)==argmax(logp)
    nll = lse - lab
    smooth = lse - tot / V
    label_smoothing = opt.get("label_smoothing", 0.0)
    loss = (1.0 - label_smoothing) * nll + label_smoothing * smooth

    mask = (labels != constants.PAD).astype(jnp.float32)
    loss_sum = jnp.sum(loss * mask)
    correct = ((amax == labels) & (labels != constants.PAD))
    metrics = {
        "word_acc_num": jnp.sum(correct.astype(jnp.float32)),
        "word_acc_den": jnp.sum(mask),
        "xent_sum": jnp.sum(nll * mask),
        "xent_count": jnp.sum(mask),
    }
    return loss_sum, metrics


def lang_loss(opt, results) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    if results.get("logits") is None and "cls_head_kernel" in results:
        # fused-xent path (trainer-injected kernel; single hidden stream,
        # plain head, no pointer — eligibility decided statically there)
        labels = _as_list(results["labels"])
        assert len(labels) == 1
        hidden = results["hidden_states"]
        denom = jnp.asarray(hidden.shape[0], jnp.float32)
        s, m = _lang_step_fused(opt, hidden, results["cls_head_kernel"],
                                labels[0])
        return s / denom, {
            "word_acc_num0": m["word_acc_num"],
            "word_acc_den0": m["word_acc_den"],
            "xent_sum": m["xent_sum"],
            "xent_count": m["xent_count"],
        }

    logits = _as_list(results["logits"])
    labels = _as_list(results["labels"])
    probs = results.get("probs", None)
    if len(labels) != len(logits):
        labels = labels * len(logits)

    if opt.get("visual_word_generation", False):
        weights = opt.get("nv_weights", [0.8, 1.0])
    else:
        weights = [1.0] * len(logits)

    denom = jnp.asarray(logits[0].shape[0], jnp.float32)
    total = 0.0
    metrics: Dict[str, jnp.ndarray] = {}
    for i, (w, lg, lb) in enumerate(zip(weights, logits, labels)):
        p = probs if (probs is not None and i == len(logits) - 1) else None
        # reference: `probs` replaces logits via the key tuple; pointer runs
        # only in single-output configs, so i==last is equivalent
        s, m = _lang_step(opt, lg, lb, p)
        total = total + w * s / denom
        suffix = f"{i}"
        metrics[f"word_acc_num{suffix}"] = m["word_acc_num"]
        metrics[f"word_acc_den{suffix}"] = m["word_acc_den"]
        if not (i == 0 and opt.get("visual_word_generation", False)):
            # perplexity only counts the caption-generation pass(es);
            # accumulate across entries (reference accumulates per pass)
            metrics["xent_sum"] = metrics.get("xent_sum", 0.0) + m["xent_sum"]
            metrics["xent_count"] = (metrics.get("xent_count", 0.0)
                                     + m["xent_count"])
        if i == 0 and opt.get("visual_word_generation", False):
            # word-acc0 ignores MASK targets (reference crit_lang.py:75-78)
            lb0 = labels[0]
            lp0 = jax.nn.log_softmax(
                logits[0][:, :lb0.shape[1], :]
                if logits[0].shape[1] == lb0.shape[1]
                else logits[0][:, :-1, :], axis=-1)
            preds = jnp.argmax(lp0, axis=-1)
            keep = (lb0 != constants.PAD) & (lb0 != constants.MASK)
            metrics["word_acc_num0"] = jnp.sum(
                ((preds == lb0) & keep).astype(jnp.float32))
            metrics["word_acc_den0"] = jnp.sum(keep.astype(jnp.float32))
    return total, metrics


# ---------------------------------------------------------------------------
# noisy-OR concept losses
# ---------------------------------------------------------------------------

def _noisy_or_mil(opt, preds_attr, avg_prob_attr, labels_attr,
                  with_metrics: bool = False):
    preds_attr = jnp.clip(preds_attr, 0.01, 0.99)
    labels_attr = labels_attr[:, :preds_attr.shape[1]].astype(jnp.float32)

    n_positive = labels_attr.sum(axis=1)
    n_attributes = preds_attr.shape[1]

    bce = -(labels_attr * jnp.log(preds_attr)
            + (1.0 - labels_attr) * jnp.log(1.0 - preds_attr))
    loss = bce.sum(axis=1) / jnp.maximum(1.0, n_positive)

    if (opt.get("attribute_prediction_sparse_sampling", False)
            and avg_prob_attr is not None):
        threshold = n_positive / n_attributes
        loss = loss + jnp.abs(jnp.maximum(avg_prob_attr, threshold) - threshold)

    metrics: Dict[str, jnp.ndarray] = {}
    if with_metrics:
        # F1@k ladder (reference pred_attribute.py evaluation ks), clamped
        # to the attribute-vocabulary size for small (synthetic) corpora
        topk_list = [k for k in (5, 10, 20, 30, 40, 50)
                     if k <= preds_attr.shape[1]] or [preds_attr.shape[1]]
        _, candidates = jax.lax.top_k(preds_attr, max(topk_list))
        hits = jnp.take_along_axis(labels_attr, candidates, axis=1)
        total_pos = labels_attr.sum(axis=1)
        for topk in topk_list:
            n_hit = hits[:, :topk].sum(axis=1)
            n_hit = jnp.where(n_hit == 0, 1e-3, n_hit)
            precision = n_hit / topk
            recall = n_hit / jnp.maximum(total_pos, 1e-6)
            f1 = 2 * precision * recall / (precision + recall)
            metrics[f"f1_{topk}_sum"] = f1.sum()
            metrics[f"f1_{topk}_count"] = jnp.asarray(
                float(preds_attr.shape[0]))
        # mAP: mean over samples of AP over positive labels
        order = jnp.argsort(-preds_attr, axis=1)
        rank = jnp.argsort(order, axis=1)              # rank of each attr
        pos_mask = labels_attr > 0
        big = jnp.where(pos_mask, rank, n_attributes + 1)
        sorted_hit_rank = jnp.sort(big, axis=1)        # positives first
        ids = jnp.arange(n_attributes)[None, :]
        valid = ids < n_positive[:, None]
        prec = (ids + 1.0) / (sorted_hit_rank + 1.0)
        ap = jnp.sum(jnp.where(valid, prec, 0.0), axis=1) \
            / jnp.maximum(n_positive, 1.0)
        has_pos = n_positive > 0
        metrics["ap_sum"] = jnp.sum(jnp.where(has_pos, ap, 0.0))
        metrics["ap_count"] = jnp.sum(has_pos.astype(jnp.float32))
    return loss.sum(), metrics


def attribute_losses(opt, results, project_fn: Optional[Callable] = None,
                     with_metrics: bool = False):
    """All concept losses for ``attribute_prediction_flags``; ``project_fn``
    applies the shared projection for decoder-side flags."""
    flags = opt["attribute_prediction_flags"]
    scales = opt.get("attribute_prediction_scales", [1.0])
    if not isinstance(scales, list):
        scales = [scales]
    if len(scales) == 1:
        scales = scales * len(flags)
    assert len(scales) == len(flags)

    labels_attr = results["labels_attr"]
    denom = jnp.asarray(labels_attr.shape[0], jnp.float32)
    out: Dict[str, jnp.ndarray] = {}
    metrics: Dict[str, jnp.ndarray] = {}
    total = 0.0
    for flag, scale in zip(flags, scales):
        if flag == "V":
            s, m = _noisy_or_mil(opt, results["preds_attr"],
                                 results["avg_prob_attr"], labels_attr,
                                 with_metrics=with_metrics)
        else:
            key = ATTR_FLAG_TO_KEY[flag]
            feats = results[key]
            if isinstance(feats, list):
                feats = feats[-1]
            scores = project_fn(feats, flag)
            labels = results["labels"]
            if isinstance(labels, (list, tuple)):
                labels = labels[-1]
            mask = labels == constants.PAD
            if scores.shape[1] == labels.shape[1] + 1:
                # embeddings may carry the BOS/prefix position; reference
                # pairs `input_embs` (T) against labels (T) -- shapes align
                scores = scores[:, :labels.shape[1], :]
            preds, avg_prob = _merged_with_mask(scores, mask)
            s, m = _noisy_or_mil(opt, preds, avg_prob, labels_attr,
                                 with_metrics=with_metrics)
        loss = s / denom
        out[f"{flag}-Attr"] = loss * scale
        total = total + loss * scale
        for k, v in m.items():
            metrics[f"{flag}_{k}"] = v
    return total, out, metrics


def _merged_with_mask(scores, mask):
    from care_tpu.models.predictors import prepare_merged_probs
    return prepare_merged_probs(scores, mask=mask, return_avg_prob=True)


# ---------------------------------------------------------------------------
# length KL
# ---------------------------------------------------------------------------

def length_loss(opt, results):
    """KL(preds || target): target * (log target - log_pred), summed
    (reference ``crit_length.py``; preds_length is already log-softmax)."""
    preds = results["preds_length"]
    target = results["length_target"]
    safe_log_t = jnp.where(target > 0, jnp.log(jnp.maximum(target, 1e-20)), 0.0)
    kl = jnp.where(target > 0, target * (safe_log_t - preds), 0.0)
    denom = jnp.asarray(preds.shape[0], jnp.float32)
    return kl.sum() / denom, {}


# ---------------------------------------------------------------------------
# auxiliary attention losses (defined in the reference ``crit_attn.py`` but
# not reachable from shipped configs; implemented for capability parity and
# registered under crits 'attn' / 'gate')
# ---------------------------------------------------------------------------

def attn_sparse_loss(opt, results):
    """L1 hinge pushing per-word attr-attention mass toward a threshold
    (reference ``crit_attn.py:7-38``)."""
    probs = results["attr_attention_probs"]
    if isinstance(probs, (list, tuple)):
        probs = probs[-1]
    labels = results["labels"]
    if isinstance(labels, (list, tuple)):
        labels = labels[-1]
    threshold = opt.get("use_attr_attn_loss_threshold", 1)
    mass = probs.sum(-1).mean(1)                 # (bsz, seq_len)
    pad = labels == constants.PAD
    mass = jnp.where(pad, threshold, mass)

    target = jnp.full(labels.shape, float(threshold))
    if opt.get("use_attr_attn_loss_mask", False):
        attribute_mask = results["attribute_mask"]
        target = jnp.where(attribute_mask == 0, 0.0, target)
    mass = jnp.where(mass < target, float(threshold), mass)
    loss = jnp.abs(mass - target)
    keep = (~pad).astype(jnp.float32)
    loss = jnp.sum(loss * keep, axis=1) / jnp.maximum(keep.sum(axis=1), 1.0)
    denom = jnp.asarray(labels.shape[0], jnp.float32)
    return loss.sum() / denom, {}


def gate_loss(opt, results):
    """BCE of gate probabilities against the non-stop-word mask
    (reference ``crit_attn.py:41-66``)."""
    labels = results["labels"]
    if isinstance(labels, (list, tuple)):
        labels = labels[-1]
    target = results["non_stop_words_mask"].reshape(-1).astype(jnp.float32)
    valid = (labels != constants.PAD).reshape(-1).astype(jnp.float32)
    gate_probs = results["gate_probs"]
    if not isinstance(gate_probs, (list, tuple)):
        gate_probs = [gate_probs]
    loss = 0.0
    for probs in gate_probs:
        p = probs.mean(2).reshape(-1)
        loss = loss + -(target * jnp.log(p + 1e-12)
                        + (1 - target) * jnp.log(1 - p + 1e-12))
    loss = jnp.sum(loss * valid)
    if opt.get("attentive_loss_wise", False):
        loss = loss / jnp.maximum(valid.sum(), 1.0)
        return loss, {}
    denom = jnp.asarray(labels.shape[0], jnp.float32)
    return loss / denom, {}


# ---------------------------------------------------------------------------
# criterion aggregator
# ---------------------------------------------------------------------------

class Criterion:
    """Weighted multi-task loss with named components
    (reference ``misc/Crit/base.py:50-113``)."""

    def __init__(self, opt: dict, skip_crit_list: List[str] = (),
                 override_opt: Optional[dict] = None,
                 with_metrics: bool = False):
        o = dict(opt)
        if override_opt:
            o.update(override_opt)
        self.opt = o
        self.crits = [c for c in o["crits"] if c not in skip_crit_list]
        self.with_metrics = with_metrics
        self.scales = {c: 1.0 for c in self.crits}
        if "lang" in self.scales:
            self.scales["lang"] = o.get("language_generation_scale", 1.0)
        if "length" in self.scales:
            self.scales["length"] = o.get("length_prediction_scale", 1.0)

    def set_scales(self, new_scales: Dict[str, float]):
        self.scales.update(new_scales)

    def __call__(self, results: Dict[str, Any],
                 project_fn: Optional[Callable] = None):
        """Returns (total_loss, loss_dict, metrics_dict) — all jnp scalars."""
        total = 0.0
        losses: Dict[str, jnp.ndarray] = {}
        metrics: Dict[str, jnp.ndarray] = {}
        for crit in self.crits:
            if crit == "lang":
                l, m = lang_loss(self.opt, results)
                losses["Lang Loss"] = l
                metrics.update(m)
                total = total + l * self.scales["lang"]
            elif crit == "attribute":
                l, per, m = attribute_losses(self.opt, results, project_fn,
                                             with_metrics=self.with_metrics)
                losses.update(per)
                metrics.update(m)
                total = total + l * self.scales.get("attribute", 1.0)
            elif crit == "length":
                l, m = length_loss(self.opt, results)
                losses["Length Loss"] = l
                total = total + l * self.scales["length"]
            elif crit == "attn":
                l, m = attn_sparse_loss(self.opt, results)
                losses["Attn Loss"] = l
                total = total + l * self.scales.get("attn", 1.0)
            elif crit == "gate":
                l, m = gate_loss(self.opt, results)
                losses["Gate Loss"] = l
                total = total + l * self.scales.get("gate", 1.0)
            else:
                raise ValueError(f"unknown crit `{crit}`")
        return total, losses, metrics
