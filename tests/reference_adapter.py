"""Import the reference PyTorch model code (read-only) for parity testing.

Stubs the reference's unavailable third-party deps (pytorch_lightning,
pycocoevalcap) so its pure-torch model modules import; provides weight
transplantation from the reference's torch state_dict into our flax param
tree. Nothing from the reference is copied — it is executed in place as the
ground truth for logit-level parity tests.
"""

import sys
import types

import numpy as np


def import_reference():
    """Make `/root/reference` importable with stubbed heavy deps; returns
    the reference's get_framework."""
    # APPEND (never prepend): the repo root also has `train`/`translate`
    # top-level modules, and prepending made a later `import train` in the
    # same pytest process resolve to /root/reference/train.py (which dies on
    # `import wget`). Appending keeps repo modules winning while still
    # letting the reference's own `models`/`config`/`misc` packages resolve
    # (no same-named packages exist earlier on sys.path).
    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")

    import torch

    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")
        pl.LightningModule = torch.nn.Module
        pl.Trainer = object
        pl.seed_everything = lambda *a, **k: None

        class _CB:
            pass
        cbs = types.ModuleType("pytorch_lightning.callbacks")
        cbs.ModelCheckpoint = _CB
        cbs.LearningRateMonitor = _CB
        pl.callbacks = cbs
        sys.modules["pytorch_lightning"] = pl
        sys.modules["pytorch_lightning.callbacks"] = cbs

    # pycocoevalcap (Java metric wrappers) — scoring isn't exercised
    for name in ["pycocoevalcap", "pycocoevalcap.bleu",
                 "pycocoevalcap.bleu.bleu", "pycocoevalcap.rouge",
                 "pycocoevalcap.rouge.rouge", "pycocoevalcap.cider",
                 "pycocoevalcap.cider.cider", "pycocoevalcap.meteor",
                 "pycocoevalcap.meteor.meteor", "pycocoevalcap.tokenizer",
                 "pycocoevalcap.tokenizer.ptbtokenizer"]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for cls in ["Bleu", "Rouge", "Cider", "Meteor", "PTBTokenizer"]:
                setattr(mod, cls, object)
            sys.modules[name] = mod

    from models.Framework import get_framework  # noqa: E402
    return get_framework


# ---------------------------------------------------------------------------
# weight transplantation: torch state_dict -> flax params
# ---------------------------------------------------------------------------

def _set(tree, path, value):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node[k]
    assert keys[-1] in node, (path, sorted(node.keys()))
    assert tuple(node[keys[-1]].shape) == tuple(value.shape), \
        (path, node[keys[-1]].shape, value.shape)
    node[keys[-1]] = value


def transplant_transformer_weights(state_dict, flax_params, opt):
    """Map the reference TransformerSeq2Seq weights into our Captioner
    params (Transformer method; Embedder encoder; NaiveHead)."""
    sd = {k: np.asarray(v.detach().cpu().numpy())
          for k, v in state_dict.items()}
    p = flax_params

    # encoder streams: encoder.Encoder_M.0.{weight,bias} (Linear),
    # .1 LayerNorm
    for char in opt["modality"]:
        C = char.upper()
        _set(p, f"encoder/Encoder_{C}/linear/kernel",
             sd[f"encoder.Encoder_{C}.0.weight"].T)
        _set(p, f"encoder/Encoder_{C}/linear/bias",
             sd[f"encoder.Encoder_{C}.0.bias"])
        _set(p, f"encoder/Encoder_{C}/ln/scale",
             sd[f"encoder.Encoder_{C}.1.weight"])
        _set(p, f"encoder/Encoder_{C}/ln/bias",
             sd[f"encoder.Encoder_{C}.1.bias"])

    # decoder embeddings
    _set(p, "decoder/embedding/word_embeddings",
         sd["decoder.embedding.word_embeddings.weight"])
    if opt.get("trainable_pe"):
        _set(p, "decoder/embedding/position_embeddings/embedding",
             sd["decoder.embedding.position_embeddings.weight"])
    _set(p, "decoder/embedding/LayerNorm/scale",
         sd["decoder.embedding.LayerNorm.weight"])
    _set(p, "decoder/embedding/LayerNorm/bias",
         sd["decoder.embedding.LayerNorm.bias"])

    # decoder layers
    for i in range(opt["num_hidden_layers_decoder"]):
        for ours, theirs in [("intra_attention", f"decoder.layers.{i}.intra_attention"),
                             ("inter_attention", f"decoder.layers.{i}.inter_attention")]:
            base = f"decoder/layer_{i}/{ours}"
            for proj in ["query", "key", "value"]:
                _set(p, f"{base}/{proj}/kernel",
                     sd[f"{theirs}.SDPA.{proj}.weight"].T)
                _set(p, f"{base}/{proj}/bias",
                     sd[f"{theirs}.SDPA.{proj}.bias"])
            _set(p, f"{base}/dense/kernel", sd[f"{theirs}.dense.weight"].T)
            _set(p, f"{base}/dense/bias", sd[f"{theirs}.dense.bias"])
            _set(p, f"{base}/LayerNorm/scale",
                 sd[f"{theirs}.LayerNorm.weight"])
            _set(p, f"{base}/LayerNorm/bias", sd[f"{theirs}.LayerNorm.bias"])
            if f"{theirs}.SDPA.hybrid_bias" in sd:
                _set(p, f"{base}/hybrid_bias",
                     sd[f"{theirs}.SDPA.hybrid_bias"])
        ffn_t = f"decoder.layers.{i}.ffn"
        ffn_o = f"decoder/layer_{i}/ffn"
        _set(p, f"{ffn_o}/dense1/kernel", sd[f"{ffn_t}.dense1.weight"].T)
        _set(p, f"{ffn_o}/dense1/bias", sd[f"{ffn_t}.dense1.bias"])
        _set(p, f"{ffn_o}/dense2/kernel", sd[f"{ffn_t}.dense2.weight"].T)
        _set(p, f"{ffn_o}/dense2/bias", sd[f"{ffn_t}.dense2.bias"])
        _set(p, f"{ffn_o}/LayerNorm/scale", sd[f"{ffn_t}.LayerNorm.weight"])
        _set(p, f"{ffn_o}/LayerNorm/bias", sd[f"{ffn_t}.LayerNorm.bias"])

    # head
    _set(p, "cls_head/tgt_word_prj/kernel",
         sd["cls_head.tgt_word_prj.weight"].T)

    return _transplant_concept_stack(sd, p, opt)


def transplant_salstm_weights(state_dict, flax_params, opt):
    """Map the reference RNNSeq2Seq (SALSTM) weights into our Captioner."""
    sd = {k: np.asarray(v.detach().cpu().numpy())
          for k, v in state_dict.items()}
    p = flax_params

    for char in opt["modality"]:
        C = char.upper()
        _set(p, f"encoder/Encoder_{C}/linear/kernel",
             sd[f"encoder.Encoder_{C}.0.weight"].T)
        _set(p, f"encoder/Encoder_{C}/linear/bias",
             sd[f"encoder.Encoder_{C}.0.bias"])
        _set(p, f"encoder/Encoder_{C}/ln/scale",
             sd[f"encoder.Encoder_{C}.1.weight"])
        _set(p, f"encoder/Encoder_{C}/ln/bias",
             sd[f"encoder.Encoder_{C}.1.bias"])

    d = "decoder"
    _set(p, f"{d}/word_embeddings", sd["decoder.embedding.weight"])
    _set(p, f"{d}/LayerNorm/scale", sd["decoder.LayerNorm.weight"])
    _set(p, f"{d}/LayerNorm/bias", sd["decoder.LayerNorm.bias"])
    # LSTM cell: torch weight_ih (4h, in) -> kernel (in, 4h)
    _set(p, f"{d}/rnn/ih/kernel", sd["decoder.rnn.weight_ih"].T)
    _set(p, f"{d}/rnn/ih/bias", sd["decoder.rnn.bias_ih"])
    _set(p, f"{d}/rnn/hh/kernel", sd["decoder.rnn.weight_hh"].T)
    _set(p, f"{d}/rnn/hh/bias", sd["decoder.rnn.bias_hh"])
    _set(p, f"{d}/v2h/kernel", sd["decoder.v2h.weight"].T)
    _set(p, f"{d}/v2h/bias", sd["decoder.v2h.bias"])
    _set(p, f"{d}/v2c/kernel", sd["decoder.v2c.weight"].T)
    _set(p, f"{d}/v2c/bias", sd["decoder.v2c.bias"])
    # additive attention
    _set(p, f"{d}/att/linear1_h/kernel", sd["decoder.att.linear1_h.weight"].T)
    _set(p, f"{d}/att/linear1_h/bias", sd["decoder.att.linear1_h.bias"])
    _set(p, f"{d}/att/linear1_f_0/kernel",
         sd["decoder.att.linear1_f.0.weight"].T)
    _set(p, f"{d}/att/linear1_f_0/bias", sd["decoder.att.linear1_f.0.bias"])
    _set(p, f"{d}/att/linear2/kernel", sd["decoder.att.linear2.weight"].T)
    _set(p, "cls_head/tgt_word_prj/kernel",
         sd["cls_head.tgt_word_prj.weight"].T)
    return p


def transplant_pointer_weights(state_dict, flax_params):
    """Map the reference Pointer (``models/Pointer.py:18-31``: bare SDPA
    q/k/v + Wq/Wc gate linears) into our ``models/pointer.py`` params."""
    sd = {k: np.asarray(v.detach().cpu().numpy())
          for k, v in state_dict.items()}
    p = flax_params
    for proj in ["query", "key", "value"]:
        _set(p, f"pointer/attention/{proj}/kernel",
             sd[f"pointer.attention.{proj}.weight"].T)
        _set(p, f"pointer/attention/{proj}/bias",
             sd[f"pointer.attention.{proj}.bias"])
    for lin in ["Wq", "Wc"]:
        _set(p, f"pointer/{lin}/kernel", sd[f"pointer.{lin}.weight"].T)
        _set(p, f"pointer/{lin}/bias", sd[f"pointer.{lin}.bias"])
    return p


def transplant_length_predictor(state_dict, flax_params, net_index=0):
    """Map the reference ``Predictor_length`` MLP
    (``pred_length.py:8-13``: Linear-ReLU-Dropout-Linear at
    ``predictor.nets.<i>.net``) into our ``PredictorLength`` params."""
    sd = {k: np.asarray(v.detach().cpu().numpy())
          for k, v in state_dict.items()}
    p = flax_params
    base = f"predictor.nets.{net_index}.net"
    _set(p, "predictor/Predictor_length/net1/kernel", sd[f"{base}.0.weight"].T)
    _set(p, "predictor/Predictor_length/net1/bias", sd[f"{base}.0.bias"])
    _set(p, "predictor/Predictor_length/net2/kernel", sd[f"{base}.3.weight"].T)
    _set(p, "predictor/Predictor_length/net2/bias", sd[f"{base}.3.bias"])
    return p


def transplant_highwaybn_encoder(state_dict, flax_variables, opt):
    """Map the ARB/NAB EncoderWithHighWayBN streams (Linear + HighWay +
    BatchNorm1d + Dropout) into params + batch_stats."""
    sd = {k: np.asarray(v.detach().cpu().numpy())
          for k, v in state_dict.items()}
    p = flax_variables["params"]
    bs = flax_variables["batch_stats"]
    for char in opt["modality"]:
        C = char.upper()
        base_t = f"encoder.Encoder_{C}"
        base_o = f"encoder/Encoder_{C}"
        _set(p, f"{base_o}/linear/kernel", sd[f"{base_t}.0.weight"].T)
        _set(p, f"{base_o}/linear/bias", sd[f"{base_t}.0.bias"])
        _set(p, f"{base_o}/highway/w1/kernel", sd[f"{base_t}.1.w1.weight"].T)
        _set(p, f"{base_o}/highway/w1/bias", sd[f"{base_t}.1.w1.bias"])
        _set(p, f"{base_o}/highway/w2/kernel", sd[f"{base_t}.1.w2.weight"].T)
        _set(p, f"{base_o}/highway/w2/bias", sd[f"{base_t}.1.w2.bias"])
        _set(p, f"{base_o}/bn/bn/scale", sd[f"{base_t}.2.bn.weight"])
        _set(p, f"{base_o}/bn/bn/bias", sd[f"{base_t}.2.bn.bias"])
        _set(bs, f"{base_o}/bn/bn/mean", sd[f"{base_t}.2.bn.running_mean"])
        _set(bs, f"{base_o}/bn/bn/var", sd[f"{base_t}.2.bn.running_var"])
    return {"params": p, "batch_stats": bs}


def _transplant_concept_stack(sd, p, opt):
    # optional concept stack (CARE)
    if opt.get("attribute_prediction"):
        # Predictor_attribute prj (single 'V' flag -> one Linear)
        _set(p, "predictor/Predictor_attribute/attribute_heads/prj/kernel",
             sd["predictor.nets.0.prj.weight"].T)
        _set(p, "predictor/Predictor_attribute/attribute_heads/prj/bias",
             sd["predictor.nets.0.prj.bias"])
    if opt.get("use_attr"):
        base_t = "predictor.nets.1.attr_embs"
        base_o = "predictor/SemanticContainer/attr_embs"
        if f"{base_t}.word_embeddings.weight" in sd:
            _set(p, f"{base_o}/word_embeddings",
                 sd[f"{base_t}.word_embeddings.weight"])
            _set(p, f"{base_o}/position_embeddings",
                 sd[f"{base_t}.position_embeddings.weight"])
            _set(p, f"{base_o}/LayerNorm/scale",
                 sd[f"{base_t}.LayerNorm.weight"])
            _set(p, f"{base_o}/LayerNorm/bias",
                 sd[f"{base_t}.LayerNorm.bias"])
        if "predictor.nets.1.semantic2hidden.weight" in sd:
            _set(p, "predictor/SemanticContainer/semantic2hidden/kernel",
                 sd["predictor.nets.1.semantic2hidden.weight"].T)
            if "predictor.nets.1.semantic2hidden.bias" in sd:
                _set(p, "predictor/SemanticContainer/semantic2hidden/bias",
                     sd["predictor.nets.1.semantic2hidden.bias"])
    return p
