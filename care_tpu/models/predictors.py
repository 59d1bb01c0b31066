"""Auxiliary predictors: concept detection (MCD), G-LSG semantic container,
length prediction.

Parity targets: reference ``models/Predictor/pred_attribute.py`` (noisy-OR
multiple-instance merge, per-flag linear heads, sparse frame sampling,
SemanticContainer with LSG concept embeddings + GSG latent-topic linear) and
``pred_length.py``.

TPU notes: the train-time sparse frame sampling is re-expressed as in-place
random masking (identical distribution, no dynamic gather shapes); top-k
concept selection is ``jax.lax.top_k``.
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from care_tpu.models.common import Dense
from care_tpu.models.embeddings import NaiveEmbeddings


def prepare_merged_probs(scores, mask=None, return_avg_prob: bool = False):
    """Noisy-OR MIL merge: 1 - prod_t (1 - sigmoid(s_t)).

    scores: [bsz, seq_len, n_attributes]; mask True = position excluded.
    Mirrors reference ``pred_attribute.py:17-46`` including the 1e-12 log
    clamp.
    """
    assert scores.ndim == 3, "[bsz, seq_len, n_attributes]"
    scores = scores.astype(jnp.float32)
    probs = jax.nn.sigmoid(scores)
    raw = jnp.log(jnp.clip(1.0 - probs, 1e-12, 1.0))

    if mask is not None:
        keep = (~mask).astype(jnp.float32)            # [bsz, seq_len]
        raw = raw * keep[:, :, None]
        denom = jnp.maximum(keep.sum(axis=1), 1.0)
        avg_prob = jnp.sum(probs.mean(axis=2) * keep, axis=1) / denom
    else:
        avg_prob = probs.mean(axis=(1, 2))

    merged = 1.0 - jnp.exp(raw.sum(axis=1))
    return (merged, avg_prob) if return_avg_prob else merged


class AttributePrjHeads(nn.Module):
    """Per-flag linear projection heads shared between the predictor and the
    decoder-side NoisyOrMILWithEmbs losses (reference ``prj`` sharing,
    ``pred_attribute.py:61-70``)."""
    opt: Dict[str, Any]

    def setup(self):
        opt = self.opt
        flags = opt["attribute_prediction_flags"]
        modality = opt.get("modality_for_predictor") or opt["modality"]
        k = opt["attribute_prediction_k"]
        channel_concat = opt.get("attribute_prediction_channel_concat", False)
        if opt.get("attribute_prediction_share_prj", False) or len(flags) == 1:
            self.shared = True
            dim_mult = len(modality) if channel_concat else 1
            self.prj = Dense(k, name="prj")
            del dim_mult  # input dim is inferred by flax
        else:
            self.shared = False
            self.prjs = [Dense(k, name=f"prj_{f}") for f in flags]

    def by_flag(self, feats, flag: Optional[str] = None):
        if self.shared:
            return self.prj(feats)
        idx = self.opt["attribute_prediction_flags"].index(flag)
        return self.prjs[idx](feats)


class PredictorAttribute(nn.Module):
    """MCD concept detector (reference ``pred_attribute.py:49-131``)."""
    opt: Dict[str, Any]

    def setup(self):
        self.heads = AttributePrjHeads(self.opt, name="attribute_heads")

    def __call__(self, encoder_hidden_states, mean_encoder_hidden_states=None,
                 deterministic: bool = True, **kwargs) -> Dict[str, Any]:
        opt = self.opt
        flags = opt["attribute_prediction_flags"]
        channel_concat = opt.get("attribute_prediction_channel_concat", False)
        mean_pooling = opt.get("attribute_prediction_mean_pooling", False)
        modality = opt.get("modality_for_predictor") or opt["modality"]
        modality = modality.replace("t", "")

        if isinstance(encoder_hidden_states, (list, tuple)):
            hidden_states = jnp.concatenate(encoder_hidden_states, axis=1)
        else:
            hidden_states = encoder_hidden_states

        if channel_concat and mean_pooling:
            hidden_states = jnp.concatenate(
                mean_encoder_hidden_states, axis=-1)[:, None, :]
        elif channel_concat:
            n_modality = len(modality)
            assert hidden_states.shape[1] % n_modality == 0
            chunks = jnp.split(hidden_states, n_modality, axis=1)
            hidden_states = jnp.concatenate(chunks, axis=-1)
        elif mean_pooling:
            hidden_states = jnp.stack(mean_encoder_hidden_states, axis=1)

        mask = None
        if (not deterministic) and opt.get("attribute_prediction_sparse_sampling", False):
            # train-time sparse frame sampling, re-expressed as random
            # in-place masking (same distribution as the reference's
            # gather-then-mask, pred_attribute.py:100-119)
            bsz, seq_len = hidden_states.shape[:2]
            rng = self.make_rng("dropout")
            k1, k2 = jax.random.split(rng)
            ratio = jax.random.uniform(k1, (bsz,))
            num = jnp.ceil(seq_len * ratio).astype(jnp.int32)
            u = jax.random.uniform(k2, (bsz, seq_len))
            rank = jnp.argsort(jnp.argsort(u, axis=1), axis=1)
            mask = rank >= num[:, None]   # True = excluded

        if "V" not in flags:
            preds_attr, avg_prob_attr = None, None
        else:
            scores = self.heads.by_flag(hidden_states, "V")
            preds_attr, avg_prob_attr = prepare_merged_probs(
                scores, mask=mask, return_avg_prob=True)

        if self.is_initializing():
            # decoder-side flag heads (I/P/C/H/T/S/A) are only applied
            # inside the loss layer (NoisyOrMILWithEmbs); touch them here so
            # their parameters materialise at init
            dummy = jnp.zeros((1, 1, opt["dim_hidden"]))
            if self.heads.shared:
                if "V" not in flags:   # e.g. TAP: single shared 'I'/'S' head
                    self.heads.by_flag(dummy, flags[0])
            else:
                for f in flags:
                    if f != "V":
                        self.heads.by_flag(dummy, f)

        return {"preds_attr": preds_attr,
                "avg_prob_attr": avg_prob_attr}

    def project_with_flag(self, feats, flag: str):
        """Expose the shared projection for decoder-side concept losses."""
        return self.heads.by_flag(feats, flag)


class TextPostProcesser(nn.Module):
    """Optional PE/LN/dropout applied to text-side embeddings for TAP
    variants (reference ``pred_attribute.py:213-236``)."""
    opt: Dict[str, Any]

    @nn.compact
    def __call__(self, word_embeddings, deterministic: bool = True):
        opt = self.opt
        if opt.get("TAP_pos", False):
            table = self.param("PE", nn.initializers.normal(0.02),
                               (opt["max_len"], opt["dim_hidden"]))
            seq_len = word_embeddings.shape[1]
            word_embeddings = word_embeddings + table[None, :seq_len]
        if opt.get("TAP_ln", False):
            word_embeddings = nn.LayerNorm(epsilon=opt["layer_norm_eps"],
                                           name="LN")(word_embeddings)
        return nn.Dropout(opt["hidden_dropout_prob"])(
            word_embeddings, deterministic=deterministic)


class SemanticContainer(nn.Module):
    """G-LSG bridge (reference ``pred_attribute.py:239-289``):

    * LSG: top-k concept ids -> ``semantic_labels``; concept embeddings via
      ``NaiveEmbeddings`` -> ``semantic_embs``;
    * GSG: linear on the (detached) concept distribution ->
      ``semantic_hidden_states``.
    """
    opt: Dict[str, Any]

    def setup(self):
        opt = self.opt
        use_attr_flags = opt.get("use_attr_flags", "") or ""
        self.has_attr_embs = "L0" not in use_attr_flags
        if self.has_attr_embs:
            self.attr_embs = NaiveEmbeddings(
                n_words=opt["attribute_prediction_k"],
                n_positions=opt["use_attr_topk"],
                dim_hidden=opt["dim_hidden"],
                layer_norm_eps=opt["layer_norm_eps"],
                hidden_dropout_prob=opt["hidden_dropout_prob"],
                padding_idx=None,
                has_dropout=not opt.get("attr_embs_no_dropout", False),
                name="attr_embs")

        self.latent_topic_flag = "emb" in (opt.get("use_attr_type") or "")
        if self.latent_topic_flag:
            self.semantic2hidden = Dense(
                opt["dim_hidden"],
                use_bias="pp_emb" in (opt.get("use_attr_type") or ""),
                name="semantic2hidden")

    def __call__(self, encoder_hidden_states=None, preds_attr=None,
                 semantic_logits=None, deterministic: bool = True,
                 **kwargs) -> Dict[str, Any]:
        opt = self.opt
        topk = opt["use_attr_topk"]

        if semantic_logits is None:
            _, semantic_labels = jax.lax.top_k(preds_attr, topk)
        else:
            assert isinstance(semantic_logits, (list, tuple))
            merged = [prepare_merged_probs(l) for l in semantic_logits]
            labels = [jax.lax.top_k(m, topk)[1] for m in merged]
            semantic_labels = jnp.concatenate(labels, axis=-1)

        semantic_embs = None
        if self.has_attr_embs:
            semantic_embs = self.attr_embs(semantic_labels,
                                           deterministic=deterministic)

        semantic_hidden_states = None
        if self.latent_topic_flag:
            src = preds_attr if opt.get("global_semantic_guidance_not_detach") \
                else jax.lax.stop_gradient(preds_attr)
            semantic_hidden_states = self.semantic2hidden(src)

        return {"semantic_embs": semantic_embs,
                "semantic_labels": semantic_labels,
                "semantic_hidden_states": semantic_hidden_states}


class PredictorLength(nn.Module):
    """Length distribution head for NAR decoding (reference
    ``pred_length.py:5-22``)."""
    opt: Dict[str, Any]

    @nn.compact
    def __call__(self, encoder_hidden_states, deterministic: bool = True,
                 **kwargs) -> Dict[str, Any]:
        if isinstance(encoder_hidden_states, (list, tuple)):
            assert len(encoder_hidden_states) == 1
            encoder_hidden_states = encoder_hidden_states[0]
        x = encoder_hidden_states.mean(axis=1)
        x = nn.relu(Dense(self.opt["dim_hidden"], name="net1")(x))
        x = nn.Dropout(self.opt["hidden_dropout_prob"])(
            x, deterministic=deterministic)
        out = Dense(self.opt["max_len"], name="net2")(x)
        return {"preds_length": jax.nn.log_softmax(out, axis=-1)}


class Predictor(nn.Module):
    """Chained container: each net's outputs feed the next
    (reference ``Predictor/base.py:6-15``)."""
    opt: Dict[str, Any]

    def setup(self):
        opt = self.opt
        nets = []
        skip_crits = {"lang"}
        for crit in opt["crits"]:
            if crit in skip_crits or crit == "length":
                continue
            if crit == "attribute":
                nets.append(PredictorAttribute(opt, name="Predictor_attribute"))
            else:
                raise ValueError(f"no predictor for crit `{crit}`")
        for name in opt.get("predictors_to_be_added", []) or []:
            if name == "SemanticContainer":
                nets.append(SemanticContainer(opt, name="SemanticContainer"))
            else:
                raise ValueError(f"unknown predictor `{name}`")
        # length predictor last (matches the teacher-init reordering,
        # reference Predictor/__init__.py:49-58, harmless otherwise)
        if "length" in opt["crits"]:
            nets.append(PredictorLength(opt, name="Predictor_length"))
        self.nets = nets

    def __call__(self, encoder_hidden_states, deterministic: bool = True,
                 **kwargs) -> Dict[str, Any]:
        results: Dict[str, Any] = {}
        for net in self.nets:
            results.update(net(encoder_hidden_states,
                               deterministic=deterministic,
                               **kwargs, **results))
        return results


def has_predictor(opt: dict) -> bool:
    crits = [c for c in opt["crits"] if c not in ("lang",)]
    return bool(crits) or bool(opt.get("predictors_to_be_added"))
