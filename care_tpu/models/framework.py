"""The Captioner: backbone -> encoder -> (predictor) -> decoder -> cls_head.

Parity target: reference ``models/Framework.py`` — ``encoding_phase`` splits
extra feats (semantic logits / retrieval streams), runs encoder + predictor
and merges predictor outputs into the decoder inputs ("concat" attr mode
appends concept embeddings to the encoder states); ``decoding_phase`` runs
decoder -> cls_head -> pointer; ``input_keys_for_decoder`` groups the static
decoder inputs that beam search enlarges once.

TPU-first deltas: one Flax module owning all submodules (a single pytree of
params), methods dispatched via ``apply(..., method=...)``; an explicit
KV-cache decode path (``init_decode_state`` / ``decode_step``) replacing the
reference's full-prefix recomputation per beam step.
"""

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from care_tpu import constants
from care_tpu.models.embeddings import NaiveEmbeddings
from care_tpu.models.encoders import get_encoder
from care_tpu.models.predictors import Predictor, has_predictor
from care_tpu.models.decoders import get_decoder, TransformerDecoder
from care_tpu.models.heads import get_cls_head
from care_tpu.models.pointer import get_pointer


def input_keys_for_decoder(opt: dict) -> List[str]:
    """Which encoding-phase outputs are static decoder inputs
    (reference ``Framework.py:20-40``)."""
    keys = ["encoder_hidden_states"]
    if opt.get("with_category", False):
        keys.append("category_embs" if opt.get("use_category_embs", False)
                    else "category")
    t = opt.get("use_attr_type") or ""
    if opt.get("use_attr", False) and ("prefix" in t or "att" in t.lower()):
        keys.append("semantic_embs")
    if "emb" in t:
        keys.append("semantic_hidden_states")
    if (opt.get("compositional_intra") or opt.get("compositional_inter")
            or opt.get("compositional_ffn")):
        keys.append("preds_attr")
    if opt.get("pointer"):
        keys += ["ret_text_embs", "ret_input_ids"]
    return keys


class TextEmbedder(nn.Module):
    """Embed retrieved-caption token ids ('t' stream).

    Reference ``models/Encoder.py:341-376``: either its own NaiveEmbeddings
    or the decoder's word+position embeddings; optional biLSTM refiner.
    """
    opt: Dict[str, Any]

    def setup(self):
        opt = self.opt
        if opt.get("has_retrieval_embs", False):
            self.embs = NaiveEmbeddings(
                n_words=opt["vocab_size"], n_positions=opt["max_len"],
                dim_hidden=opt["dim_hidden"], padding_idx=constants.PAD,
                layer_norm_eps=opt["layer_norm_eps"],
                hidden_dropout_prob=opt["hidden_dropout_prob"], name="embs")
        if opt.get("has_retrieval_rnn", False):
            self.rnn_fwd = nn.RNN(nn.OptimizedLSTMCell(opt["dim_hidden"]),
                                  name="rnn_fwd")
            self.rnn_bwd = nn.RNN(nn.OptimizedLSTMCell(opt["dim_hidden"]),
                                  reverse=True, keep_order=True, name="rnn_bwd")
            self.rnn_ln = nn.LayerNorm(epsilon=opt["layer_norm_eps"],
                                       name="LayerNorm")
            self.rnn_dropout = nn.Dropout(0.5)

    def __call__(self, input_ids, embeddings_module=None,
                 deterministic: bool = True):
        assert input_ids.ndim == 3, input_ids.shape
        bsz, n_retrieval, max_len = input_ids.shape
        flat = input_ids.reshape(bsz * n_retrieval, max_len)

        if hasattr(self, "embs"):
            embs = self.embs(flat, deterministic=deterministic)
        else:
            embs = embeddings_module(flat, only_word_and_position=True,
                                     deterministic=deterministic)
        if hasattr(self, "rnn_fwd"):
            fwd = self.rnn_fwd(embs)
            bwd = self.rnn_bwd(embs)
            embs = (fwd + bwd) / 2
            embs = self.rnn_dropout(self.rnn_ln(embs),
                                    deterministic=deterministic)
        return embs.reshape(bsz, n_retrieval, max_len, -1)


class Captioner(nn.Module):
    """One module owning encoder/predictor/decoder/head/pointer."""
    opt: Dict[str, Any]

    def setup(self):
        opt = self.opt
        from care_tpu.models.backbone import get_backbone
        self.backbone = get_backbone(opt)
        self.encoder = get_encoder(opt)
        self.predictor = Predictor(opt, name="predictor") \
            if has_predictor(opt) else None
        self.decoder = get_decoder(opt)
        self.cls_head = get_cls_head(opt)
        self.pointer = get_pointer(opt)
        if "t" in opt["modality"]:
            self.text_embedder = TextEmbedder(opt, name="text_embedder")
        self.decoder_input_keys = input_keys_for_decoder(opt)
        self.is_rnn = "rnn" in opt["decoder"].lower()

    # ------------------------------------------------------------------
    def encoding_phase(self, feats: List[jnp.ndarray],
                       deterministic: bool = True) -> Dict[str, Any]:
        opt = self.opt
        modality = opt["modality"]
        feats, other_feats = feats[:len(modality)], feats[len(modality):]

        semantic_logits = None
        text_embs = None
        if other_feats:
            if opt.get("logits", []):
                semantic_logits = other_feats[0]
            if opt.get("retrieval", False):
                text_embs = other_feats[-1]

        if self.backbone is not None:
            feats = self.backbone(feats)

        # split the 't' stream off before the dense encoder
        ret_input_ids = None
        ret_text_embs = None
        dense_feats = []
        for char, f in zip(modality, feats):
            if char == "t":
                ret_input_ids = f
                ret_text_embs = self.text_embedder(
                    f, embeddings_module=self._decoder_embedding(),
                    deterministic=deterministic)
            else:
                dense_feats.append(f)

        data = self.encoder(dense_feats, deterministic=deterministic)

        inputs_for_predictor = data.pop("inputs_for_predictor", data)
        inputs_for_decoder = data.pop("inputs_for_decoder", data)
        if ret_input_ids is not None:
            inputs_for_decoder["ret_input_ids"] = ret_input_ids
            inputs_for_decoder["ret_text_embs"] = ret_text_embs

        if self.predictor is not None:
            predictor_outputs = self.predictor(
                inputs_for_predictor["encoder_hidden_states"],
                mean_encoder_hidden_states=inputs_for_predictor.get(
                    "mean_encoder_hidden_states"),
                semantic_logits=semantic_logits,
                text_embs=text_embs,
                deterministic=deterministic)
            inputs_for_decoder.update(predictor_outputs)

            if "concat" in (opt.get("use_attr_type") or ""):
                inputs_for_decoder["encoder_hidden_states"] = jnp.concatenate(
                    [inputs_for_decoder["encoder_hidden_states"],
                     inputs_for_decoder["semantic_embs"]], axis=1)

        return inputs_for_decoder

    def _decoder_embedding(self):
        if isinstance(self.decoder, TransformerDecoder):
            return self.decoder.embedding
        raise ValueError("text stream requires a transformer decoder")

    def prepare_inputs_for_decoder(self, encoding_phase_outputs: Dict[str, Any],
                                   batch: Dict[str, Any]) -> Dict[str, Any]:
        out = {}
        for key in self.decoder_input_keys:
            if key in encoding_phase_outputs:
                out[key] = encoding_phase_outputs[key]
            elif key in batch:
                out[key] = batch[key]
            else:
                raise KeyError(f"decoder input `{key}` not found")
        return out

    # ------------------------------------------------------------------
    def decoding_phase(self, input_ids, inputs_for_decoder: Dict[str, Any],
                       last_time_step_logits: bool = False,
                       deterministic: bool = True,
                       rnn_state=None,
                       schedule_sampling_prob: float = 0.0,
                       attr_input_ids=None,
                       collect_aux: bool = True,
                       compute_logits: bool = True) -> Dict[str, Any]:
        """``compute_logits=False`` (fused-xent training path,
        ``ops/fused_xent.py``): skip the vocab projection — the criterion
        computes its statistics chunkwise from ``hidden_states`` and the
        head kernel so the ``[B, L, V]`` logits never materialise.  Only
        requested by the trainer for eligible configs (plain NaiveHead,
        no pointer, single hidden stream)."""
        if self.is_rnn:
            return self._rnn_decoding_phase(
                input_ids, inputs_for_decoder,
                last_time_step_logits=last_time_step_logits,
                deterministic=deterministic, rnn_state=rnn_state,
                schedule_sampling_prob=schedule_sampling_prob)

        outputs = self.decoder(
            input_ids,
            deterministic=deterministic,
            attr_input_ids=attr_input_ids,
            collect_aux=collect_aux,
            **inputs_for_decoder)
        hidden_states = outputs["hidden_states"]

        if (not compute_logits and not last_time_step_logits
                and self.pointer is None):
            # callers passing compute_logits=False consume hidden_states
            # directly (possibly a list — they take the last entry, like
            # the logits-list convention below)
            return outputs

        if last_time_step_logits:
            if isinstance(hidden_states, list):
                hidden_states = hidden_states[-1]
            logits = self.cls_head(hidden_states[:, -1, :],
                                   deterministic=deterministic)
        elif isinstance(hidden_states, list):
            logits = [self.cls_head(h, deterministic=deterministic)
                      for h in hidden_states]
        else:
            logits = self.cls_head(hidden_states, deterministic=deterministic)
        outputs["logits"] = logits

        if self.pointer is not None:
            outputs.update(self.pointer(
                **{**inputs_for_decoder, **outputs},
                last_time_step_logits=last_time_step_logits,
                deterministic=deterministic))
        return outputs

    def _rnn_decoding_phase(self, input_ids, inputs_for_decoder,
                            last_time_step_logits=False, deterministic=True,
                            rnn_state=None, schedule_sampling_prob=0.0):
        kwargs = {k: v for k, v in inputs_for_decoder.items()
                  if k != "encoder_hidden_states"}
        if last_time_step_logits:
            it = input_ids[:, -1] if input_ids.ndim == 2 else input_ids
            out = self.decoder.forward_step(
                it, inputs_for_decoder["encoder_hidden_states"],
                rnn_state, deterministic=deterministic, **kwargs)
            out["logits"] = self.cls_head(out["hidden_states"],
                                          deterministic=deterministic)
            return out
        return self.decoder(
            input_ids, inputs_for_decoder["encoder_hidden_states"],
            cls_head=lambda h: self.cls_head(h, deterministic=deterministic),
            schedule_sampling_prob=schedule_sampling_prob,
            deterministic=deterministic, **kwargs)

    # ------------------------------------------------------------------
    def __call__(self, batch: Dict[str, Any], deterministic: bool = True,
                 schedule_sampling_prob: float = 0.0,
                 collect_aux: bool = True,
                 compute_logits: bool = True) -> Dict[str, Any]:
        """feedforward_step (reference ``Framework.py:215-234``)."""
        encoding_phase_outputs = self.encoding_phase(
            batch["feats"], deterministic=deterministic)
        inputs_for_decoder = self.prepare_inputs_for_decoder(
            encoding_phase_outputs, batch)
        decoding_phase_outputs = self.decoding_phase(
            batch["input_ids"], inputs_for_decoder,
            deterministic=deterministic,
            schedule_sampling_prob=schedule_sampling_prob,
            attr_input_ids=batch.get("attr_input_ids"),
            collect_aux=collect_aux,
            compute_logits=compute_logits)
        return {**encoding_phase_outputs, **decoding_phase_outputs,
                "schedule_sampling_prob": schedule_sampling_prob}

    # ------------------------------------------------------------------
    # KV-cached incremental decoding entry points (transformer decoders)
    # ------------------------------------------------------------------
    def init_decode_state(self, inputs_for_decoder: Dict[str, Any],
                          max_len: int, beam_size: int = 1) -> Dict[str, Any]:
        """``beam_size`` > 1 expects UN-enlarged inputs: the self-KV cache
        is laid out at B*beam rows while cross/attr K/V stay at B (beams
        share them; see ``TransformerDecoder.init_decode_state``)."""
        enc = inputs_for_decoder["encoder_hidden_states"]
        enc0 = enc[0] if isinstance(enc, (list, tuple)) else enc
        bsz = enc0.shape[0] * beam_size
        return self.decoder.init_decode_state(
            batch_size=bsz, max_len=max_len, beam_size=beam_size,
            # cache dtype follows the activations so half-precision decode
            # (compute_dtype_decode) gets a bf16 KV cache, not an f32 one
            # that dynamic_update_slice would reject
            dtype=enc0.dtype,
            encoder_hidden_states=enc,
            semantic_embs=inputs_for_decoder.get("semantic_embs"),
            semantic_hidden_states=inputs_for_decoder.get("semantic_hidden_states"),
            preds_attr=inputs_for_decoder.get("preds_attr"),
            category=inputs_for_decoder.get("category"),
            category_embs=inputs_for_decoder.get("category_embs"))

    def decode_step_hidden(self, token_ids, position, state):
        """One AR step returning the decoder hidden states [B, H] BEFORE
        the vocab projection — the fused head+top-k serving path
        (``ops/fused_head_topk.py``) streams the projection in vocab
        chunks so the [B, V] logits never land in HBM.  Only valid for
        plain-head models (NaiveHead, no pointer): the translator gates
        on that statically."""
        return self.decoder.decode_step(token_ids, position, state)

    def decode_step(self, token_ids, position, state,
                    inputs_for_decoder: Optional[Dict[str, Any]] = None):
        """One AR step: returns (log-probs or logits [B, V], new state)."""
        h, new_state = self.decoder.decode_step(token_ids, position, state)
        logits = self.cls_head(h, deterministic=True)
        if self.pointer is not None and inputs_for_decoder is not None:
            out = self.pointer(
                hidden_states=h[:, None, :],
                ret_text_embs=inputs_for_decoder["ret_text_embs"],
                ret_input_ids=inputs_for_decoder["ret_input_ids"],
                logits=logits[:, None, :],
                last_time_step_logits=False, deterministic=True)
            probs = out["probs"][:, 0, :]
            return jnp.log(probs + 1e-9), new_state, True
        return logits, new_state, False

    def init_rnn_carry(self, inputs_for_decoder: Dict[str, Any]):
        return self.decoder.init_rnn_state(
            inputs_for_decoder["encoder_hidden_states"])

    def rnn_decode_step(self, token_ids, rnn_state,
                        inputs_for_decoder: Dict[str, Any]):
        kwargs = {k: v for k, v in inputs_for_decoder.items()
                  if k != "encoder_hidden_states"}
        out = self.decoder.forward_step(
            token_ids, inputs_for_decoder["encoder_hidden_states"],
            rnn_state, deterministic=True, **kwargs)
        logits = self.cls_head(out["hidden_states"], deterministic=True)
        return logits, out["decoder_rnn_hidden_states"]

    # decoder-side concept projection, shared with the loss layer
    def project_attribute(self, feats, flag: str):
        return self.predictor.nets[0].project_with_flag(feats, flag)


def build_captioner(opt: dict) -> Captioner:
    return Captioner(opt)
