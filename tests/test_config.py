"""Config-cascade fixtures: overlay order, scope templating, flag plumbing."""

import pytest

from care_tpu.config import get_opt


def _opt(**kw):
    base = {"vocab_size": 100}
    base.update(kw)
    return get_opt(base, read_vocab=False, resolve_paths=False)


def test_care_scope_and_modality_union():
    opt = _opt(dataset="MSRVTT", method="Transformer", task="CARE",
               feats="ViT", decoder_modality_flags="VA",
               predictor_modality_flags="VAT")
    assert opt["scope"] == "base_ViT_VA_VAT"
    assert opt["modality"] == "amir"
    assert opt["modality_for_decoder"] == "ami"
    assert opt["modality_for_predictor"] == "amir"
    assert opt["use_attr_type"] == "emb_concat"
    assert opt["add_hybrid_attention_bias"] is True
    assert opt["wrapper"] == "MultipleOptimizerModel"
    assert "attribute" in opt["crits"]
    assert opt["predictors_to_be_added"] == ["SemanticContainer"]


def test_cabase_flags():
    opt = _opt(dataset="MSRVTT", method="Transformer", task="CABase",
               feats="ViT", decoder_modality_flags="V")
    assert opt["use_attr_flags"] == "G0L1"
    assert opt["use_attr_type"] == "_att"
    assert opt["attr_layer_pos"] == "cross2attr"
    assert opt["add_hybrid_attention_bias"] is False
    assert opt["modality_for_predictor"] == "mi"   # V flag


def test_base_task_scope_format():
    opt = _opt(dataset="MSRVTT", method="Transformer", task="Base",
               feats="ViT", modality="ami")
    assert opt["scope"] == "base_ViT_ami"


def test_nacf_inherits_nab():
    opt = _opt(dataset="MSRVTT", method="NACF", task="Base", feats="ViT",
               modality="ami")
    assert opt["decoder"] == "TwoStageTransformerDecoder"
    assert opt["decoding_type"] == "NARFormer"
    assert opt["visual_word_generation"] is True
    assert opt["use_ct"] is True
    assert opt["length_beam_size"] == 6
    assert opt["beam_alpha"] == 1.35
    assert "length" in opt["crits"]
    # teacher path inferred from the parallel ARB folder
    assert "ARB" in opt.get("teacher_path", ""), opt.get("teacher_path")
    assert opt["load_model_weights_from"] == opt["teacher_path"]


def test_pointer_gen_adds_t_modality():
    opt = _opt(dataset="MSRVTT", method="PointerGen", task="Base",
               feats="ViT", modality="ami")
    assert opt["pointer"] == "Pointer"
    assert opt["modality"].endswith("t")
    assert opt["retrieval"] is True


def test_arch_presets():
    for arch, d, heads in [("base", 512, 8), ("median", 768, 12),
                           ("large", 1024, 16)]:
        opt = _opt(dataset="MSVD", method="Transformer", task="Base",
                   feats="ViT", modality="mi", arch=arch)
        assert opt["dim_hidden"] == d
        assert opt["num_attention_heads"] == heads
        assert opt["trainable_pe"] is True


def test_category_disabled_outside_msrvtt():
    opt = _opt(dataset="MSVD", method="Transformer", task="Base",
               feats="ViT", modality="mi", with_category=True)
    assert opt["with_category"] is False
