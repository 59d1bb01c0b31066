"""Reference-checkpoint conversion end to end.

A reference user's trained Lightning checkpoint
(``{'state_dict': captioner.* , 'hyper_parameters': {'opt'}}``, the format
``models/__init__.py:115`` loads) must convert into our checkpoint format
and serve with reference-equal logits through our normal ``load_model``
path — the actual switch-over story, not just the test-side transplant.
"""

import os
import sys

import numpy as np
import pytest

from test_reference_parity import _our_opt, _ref_opt

from reference_adapter import import_reference

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "misc_tools"))


def _fake_lightning_ckpt(torch, ref_model, opt, path):
    """Simulate the reference Wrapper's checkpoint: the captioner lives at
    ``self.captioner`` (``Wrapper.py:32``), so its state_dict keys carry
    the ``captioner.`` prefix."""
    sd = {f"captioner.{k}": v for k, v in ref_model.state_dict().items()}
    torch.save({"state_dict": sd, "hyper_parameters": {"opt": opt}}, path)


def test_convert_care_transformer_checkpoint(tmp_path):
    torch = pytest.importorskip("torch")
    get_framework = import_reference()
    from convert_reference_ckpt import convert

    ref_opt = _ref_opt(care=True)
    torch.manual_seed(0)
    ref_model = get_framework(dict(ref_opt))
    ref_model.eval()

    opt = _our_opt(ref_opt)
    in_path = str(tmp_path / "ref.ckpt")
    out_path = str(tmp_path / "converted.ckpt")
    _fake_lightning_ckpt(torch, ref_model, opt, in_path)

    report = convert(in_path, out_path, verbose=False)
    assert report["unmapped"] == []

    # serve through the NORMAL loading path (strict: every template param
    # must come from the converted checkpoint)
    from care_tpu.models.loading import load_model
    models, loaded_opt = load_model(out_path, do_replace_paths=False,
                                    strict=True)
    (model, variables), = models
    assert loaded_opt["decoder"] == "TransformerDecoder"

    B = 3
    rs = np.random.RandomState(7)
    feats_np = [rs.randn(B, 8, 24).astype(np.float32),
                rs.randn(B, 8, 16).astype(np.float32)]
    input_ids_np = rs.randint(6, 40, (B, 11)).astype(np.int64)

    with torch.no_grad():
        ref_out = ref_model({
            "feats": [torch.from_numpy(f) for f in feats_np],
            "input_ids": torch.from_numpy(input_ids_np)})

    import jax.numpy as jnp
    out = model.apply(variables,
                      {"feats": [jnp.asarray(f) for f in feats_np],
                       "input_ids": jnp.asarray(
                           input_ids_np.astype(np.int32))},
                      deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               ref_out["logits"].numpy(),
                               atol=2e-4, rtol=1e-4)


def test_convert_nab_highwaybn_checkpoint(tmp_path):
    """HighWayBN encoder: BatchNorm running stats must land in
    batch_stats and survive the save/load round trip."""
    torch = pytest.importorskip("torch")
    get_framework = import_reference()
    from convert_reference_ckpt import convert

    ref_opt = _ref_opt()
    ref_opt.update({"encoder": "EncoderWithHighWayBN",
                    "decoding_type": "NARFormer", "enhance_input": 2})
    torch.manual_seed(0)
    ref_model = get_framework(dict(ref_opt))
    # randomize BN running stats away from init so parity actually tests
    # the transplanted buffers
    with torch.no_grad():
        for m in ref_model.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.4)
    ref_model.eval()

    opt = _our_opt(ref_opt)
    in_path = str(tmp_path / "ref.ckpt")
    out_path = str(tmp_path / "converted.ckpt")
    _fake_lightning_ckpt(torch, ref_model, opt, in_path)

    report = convert(in_path, out_path, verbose=False)
    assert report["unmapped"] == []

    from care_tpu.models.loading import load_model
    models, _ = load_model(out_path, do_replace_paths=False, strict=True)
    (model, variables), = models
    assert "batch_stats" in variables

    B = 3
    rs = np.random.RandomState(5)
    feats_np = [rs.randn(B, 8, 24).astype(np.float32),
                rs.randn(B, 8, 16).astype(np.float32)]
    canvas = np.full((B, 11), 4, dtype=np.int64)
    canvas[:, 8:] = 0

    with torch.no_grad():
        ref_out = ref_model({"feats": [torch.from_numpy(f)
                                       for f in feats_np],
                             "input_ids": torch.from_numpy(canvas)})

    import jax.numpy as jnp
    out = model.apply(variables,
                      {"feats": [jnp.asarray(f) for f in feats_np],
                       "input_ids": jnp.asarray(canvas.astype(np.int32))},
                      deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               ref_out["logits"].numpy(),
                               atol=3e-4, rtol=1e-4)


def test_convert_rejects_unmapped_params(tmp_path):
    """A checkpoint with a parameter we cannot place must fail loudly,
    not silently serve fresh random weights for that module."""
    torch = pytest.importorskip("torch")
    get_framework = import_reference()
    from convert_reference_ckpt import convert

    ref_opt = _ref_opt()
    torch.manual_seed(0)
    ref_model = get_framework(dict(ref_opt))
    opt = _our_opt(ref_opt)

    sd = {f"captioner.{k}": v for k, v in ref_model.state_dict().items()}
    sd["captioner.mystery_module.weight"] = torch.zeros(3, 3)
    in_path = str(tmp_path / "ref.ckpt")
    torch.save({"state_dict": sd, "hyper_parameters": {"opt": opt}},
               in_path)

    with pytest.raises(SystemExit):
        convert(in_path, str(tmp_path / "out.ckpt"), verbose=False)
    report = convert(in_path, str(tmp_path / "out2.ckpt"),
                     allow_unmapped=True, verbose=False)
    assert report["unmapped"] == ["mystery_module.weight"]


def _decode_parity_inputs(rs, B=3):
    feats_np = [rs.randn(B, 8, 24).astype(np.float32),
                rs.randn(B, 8, 16).astype(np.float32)]
    input_ids_np = rs.randint(6, 40, (B, 11)).astype(np.int64)
    return feats_np, input_ids_np


def _convert_and_compare(torch, tmp_path, ref_model, opt, feats_np,
                         input_ids_np, atol=3e-4):
    from convert_reference_ckpt import convert
    in_path = str(tmp_path / "ref.ckpt")
    out_path = str(tmp_path / "converted.ckpt")
    _fake_lightning_ckpt(torch, ref_model, opt, in_path)
    report = convert(in_path, out_path, verbose=False)
    assert report["unmapped"] == []

    from care_tpu.models.loading import load_model
    models, _ = load_model(out_path, do_replace_paths=False, strict=True)
    (model, variables), = models

    with torch.no_grad():
        ref_out = ref_model({
            "feats": [torch.from_numpy(f) for f in feats_np],
            "input_ids": torch.from_numpy(input_ids_np)})

    import jax.numpy as jnp
    out = model.apply(variables,
                      {"feats": [jnp.asarray(f) for f in feats_np],
                       "input_ids": jnp.asarray(
                           input_ids_np.astype(np.int32))},
                      deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               ref_out["logits"].numpy(),
                               atol=atol, rtol=1e-4)


def test_convert_topdown_checkpoint(tmp_path):
    """TopDown: two LSTM cells + Sequential v2h/v2c + additive attention —
    first torch-parity coverage for this decoder (the method-forward tests
    only compare it to itself)."""
    torch = pytest.importorskip("torch")
    get_framework = import_reference()

    ref_opt = _ref_opt()
    ref_opt.update({"decoder": "TopDownAttentionRNNDecoder",
                    "rnn_type": "lstm", "scheduled_sampling_start": -1})
    torch.manual_seed(0)
    ref_model = get_framework(dict(ref_opt))
    ref_model.eval()

    rs = np.random.RandomState(11)
    feats_np, input_ids_np = _decode_parity_inputs(rs)
    _convert_and_compare(torch, tmp_path, ref_model, _our_opt(ref_opt),
                         feats_np, input_ids_np)


def test_convert_voe_checkpoint(tmp_path):
    """VOE: chained per-modality torch nn.GRUs (r/z/n gates, dual biases)
    -> flax GRUCell params (hidden-side r/z biases folded in), BN running
    stats -> batch_stats, SALSTM decoder without v2h/v2c."""
    torch = pytest.importorskip("torch")
    get_framework = import_reference()

    ref_opt = _ref_opt()
    ref_opt.update({"encoder": "VOE", "decoder": "VOERNNDecoder",
                    "rnn_type": "lstm", "scheduled_sampling_start": -1})
    torch.manual_seed(0)
    ref_model = get_framework(dict(ref_opt))
    with torch.no_grad():
        for m in ref_model.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.4)
    ref_model.eval()

    rs = np.random.RandomState(13)
    feats_np, input_ids_np = _decode_parity_inputs(rs)
    _convert_and_compare(torch, tmp_path, ref_model, _our_opt(ref_opt),
                         feats_np, input_ids_np)


def test_convert_salstm_checkpoint(tmp_path):
    torch = pytest.importorskip("torch")
    get_framework = import_reference()

    ref_opt = _ref_opt()
    ref_opt.update({"decoder": "SingleLayerRNNDecoder", "rnn_type": "lstm",
                    "scheduled_sampling_start": -1})
    torch.manual_seed(0)
    ref_model = get_framework(dict(ref_opt))
    ref_model.eval()

    rs = np.random.RandomState(17)
    feats_np, input_ids_np = _decode_parity_inputs(rs)
    _convert_and_compare(torch, tmp_path, ref_model, _our_opt(ref_opt),
                         feats_np, input_ids_np)


def test_convert_pointer_checkpoint(tmp_path):
    """PointerGen: the dispatcher must notice the ``pointer.*`` keys and
    transplant the copy-gate attention; parity on the pointer ``probs``."""
    torch = pytest.importorskip("torch")
    get_framework = import_reference()
    from convert_reference_ckpt import convert

    ref_opt = _ref_opt()
    ref_opt.update({
        "modality": "mit", "pointer": "Pointer", "retrieval": True,
        "retrieval_topk": 3, "copy_scale": 1.0, "exclude_eos": True,
        "has_retrieval_embs": False, "has_retrieval_rnn": False})
    torch.manual_seed(1)
    ref_model = get_framework(dict(ref_opt))
    ref_model.eval()

    opt = _our_opt(ref_opt)
    in_path = str(tmp_path / "ref.ckpt")
    out_path = str(tmp_path / "converted.ckpt")
    _fake_lightning_ckpt(torch, ref_model, opt, in_path)
    report = convert(in_path, out_path, verbose=False)
    assert report["unmapped"] == []
    assert any(k.startswith("pointer.") for k in report["consumed"])

    from care_tpu.models.loading import load_model
    models, _ = load_model(out_path, do_replace_paths=False, strict=True)
    (model, variables), = models

    rs = np.random.RandomState(23)
    B, R, S = 3, 3, 7
    dense = [rs.randn(B, ref_opt["n_frames"],
                      ref_opt[f"dim_{c}"]).astype(np.float32)
             for c in "mi"]
    ret_lens = rs.randint(3, S + 1, (B, R))
    ret_ids = np.where(np.arange(S)[None, None, :] < ret_lens[:, :, None],
                       rs.randint(6, ref_opt["vocab_size"], (B, R, S)),
                       0).astype(np.int64)
    input_ids_np = rs.randint(6, 40, (B, 11)).astype(np.int64)

    with torch.no_grad():
        ref_out = ref_model({
            "feats": [torch.from_numpy(f) for f in dense]
            + [torch.from_numpy(ret_ids)],
            "input_ids": torch.from_numpy(input_ids_np)})

    import jax.numpy as jnp
    to_j = lambda f: jnp.asarray(
        f.astype(np.int32) if f.dtype == np.int64 else f)
    out = model.apply(variables,
                      {"feats": [to_j(f) for f in dense + [ret_ids]],
                       "input_ids": jnp.asarray(
                           input_ids_np.astype(np.int32))},
                      deterministic=True)
    key = "probs" if "probs" in ref_out else "logits"
    np.testing.assert_allclose(np.asarray(out[key]),
                               ref_out[key].numpy(),
                               atol=3e-4, rtol=1e-4)


def test_convert_nacf_checkpoint(tmp_path):
    """NACF: HighWayBN encoder + TwoStage decoder + length predictor —
    the dispatcher must locate the Predictor_length net index in
    ``predictor.nets`` and route the rest through the transformer/
    highwaybn mappers."""
    torch = pytest.importorskip("torch")
    get_framework = import_reference()
    from convert_reference_ckpt import convert
    from test_score_parity_rehearsal import _make_nar_env, _nar_ref_opt_from

    opt, corpus, refs = _make_nar_env(tmp_path)
    ref_opt = _nar_ref_opt_from(opt)
    torch.manual_seed(0)
    ref_model = get_framework(dict(ref_opt))
    ref_model.eval()

    in_path = str(tmp_path / "ref.ckpt")
    out_path = str(tmp_path / "converted.ckpt")
    _fake_lightning_ckpt(torch, ref_model, opt, in_path)
    report = convert(in_path, out_path, verbose=False)
    assert report["unmapped"] == []
    assert any("Predictor_length" not in k and ".net." in k
               for k in report["consumed"])

    from care_tpu.models.loading import load_model
    models, _ = load_model(out_path, do_replace_paths=False, strict=True)
    (model, variables), = models

    B = 3
    rs = np.random.RandomState(29)
    feats_np = [rs.randn(B, opt["n_frames"],
                         opt[f"dim_{c}"]).astype(np.float32)
                for c in opt["modality"]]
    canvas = np.full((B, 11), 4, dtype=np.int64)
    canvas[:, 8:] = 0

    with torch.no_grad():
        ref_out = ref_model({"feats": [torch.from_numpy(f)
                                       for f in feats_np],
                             "input_ids": torch.from_numpy(canvas)})

    import jax.numpy as jnp
    out = model.apply(variables,
                      {"feats": [jnp.asarray(f) for f in feats_np],
                       "input_ids": jnp.asarray(canvas.astype(np.int32))},
                      deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               ref_out["logits"].numpy(),
                               atol=3e-4, rtol=1e-4)


@pytest.mark.parametrize("encoder,modality", [
    ("ReLUEmbedder", "mi"),
    ("SingleStreamEmbedder", "mi"),
    ("MultiTransformerEncoder", "mi"),
])
def test_convert_stream_encoder_variants(tmp_path, encoder, modality):
    """Remaining CLI-reachable encoder families (``Encoder.py:159-207``)
    convert with logit parity — first torch-parity coverage for the
    transformer-encoder variants (incl. trainable encoder PE)."""
    torch = pytest.importorskip("torch")
    get_framework = import_reference()

    ref_opt = _ref_opt()
    ref_opt.update({"encoder": encoder, "modality": modality,
                    "num_hidden_layers_encoder": 2})
    torch.manual_seed(0)
    ref_model = get_framework(dict(ref_opt))
    ref_model.eval()

    rs = np.random.RandomState(31)
    B = 3
    feats_np = [rs.randn(B, 8, ref_opt[f"dim_{c}"]).astype(np.float32)
                for c in modality]
    input_ids_np = rs.randint(6, 40, (B, 11)).astype(np.int64)
    _convert_and_compare(torch, tmp_path, ref_model, _our_opt(ref_opt),
                         feats_np, input_ids_np)


def test_convert_identity_encoder(tmp_path):
    torch = pytest.importorskip("torch")
    get_framework = import_reference()

    ref_opt = _ref_opt()
    ref_opt.update({"encoder": "Identity", "modality": "m", "dim_m": 64})
    torch.manual_seed(0)
    ref_model = get_framework(dict(ref_opt))
    ref_model.eval()

    rs = np.random.RandomState(37)
    B = 3
    feats_np = [rs.randn(B, 8, 64).astype(np.float32)]
    input_ids_np = rs.randint(6, 40, (B, 11)).astype(np.int64)
    _convert_and_compare(torch, tmp_path, ref_model, _our_opt(ref_opt),
                         feats_np, input_ids_np)


def test_convert_cnn_patch_checkpoint(tmp_path):
    """CNN1 conversion: Conv3d kernels transposed to NDHWC and BN running
    stats into batch_stats.  The reference cannot run these encoders in
    its full framework (CNNBase returns a tensor where ``encoding_phase``
    asserts a dict, ``Framework.py:166-168``) so parity is checked on the
    encoder module with the converted-and-reloaded variables."""
    torch = pytest.importorskip("torch")
    get_framework = import_reference()
    from convert_reference_ckpt import convert

    ref_opt = _ref_opt()
    ref_opt.update({"encoder": "CNN1", "modality": "m", "dim_t": 16})
    torch.manual_seed(0)
    ref_model = get_framework(dict(ref_opt))
    with torch.no_grad():
        for m in ref_model.modules():
            if isinstance(m, torch.nn.BatchNorm3d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.4)
    ref_model.eval()

    opt = _our_opt(ref_opt)
    in_path = str(tmp_path / "ref.ckpt")
    out_path = str(tmp_path / "converted.ckpt")
    _fake_lightning_ckpt(torch, ref_model, opt, in_path)
    report = convert(in_path, out_path, verbose=False)
    assert report["unmapped"] == []

    from care_tpu.models.loading import load_model
    models, loaded_opt = load_model(out_path, do_replace_paths=False,
                                    strict=True)
    (_, variables), = models

    rs = np.random.RandomState(41)
    x = rs.randn(2, 8, 3, 16).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model.encoder(torch.from_numpy(x)).numpy()

    import jax.numpy as jnp
    from care_tpu.models.encoders import get_encoder
    enc = get_encoder(loaded_opt)
    enc_vars = {"params": variables["params"]["encoder"],
                "batch_stats": variables["batch_stats"]["encoder"]}
    out = enc.apply(enc_vars, [jnp.asarray(x)])
    np.testing.assert_allclose(
        np.asarray(out["encoder_hidden_states"]), ref_out,
        atol=2e-5, rtol=2e-5)


def test_convert_transformer_encoder_checkpoint(tmp_path):
    """TransformerEncoder (per-stream Linear + shared post-fusion
    backbone): the reference class cannot run its own forward —
    ``MultipleStreams.forward`` passes the data *dict* into the overridden
    tensor-typed ``post_processing`` (``Encoder.py:122`` vs ``196-207``) —
    so parity is checked module-by-module on the converted variables
    (stream linear, then backbone with trainable encoder PE)."""
    torch = pytest.importorskip("torch")
    get_framework = import_reference()
    from convert_reference_ckpt import convert

    ref_opt = _ref_opt()
    ref_opt.update({"encoder": "TransformerEncoder", "modality": "m",
                    "num_hidden_layers_encoder": 2})
    torch.manual_seed(0)
    ref_model = get_framework(dict(ref_opt))
    ref_model.eval()

    opt = _our_opt(ref_opt)
    in_path = str(tmp_path / "ref.ckpt")
    out_path = str(tmp_path / "converted.ckpt")
    _fake_lightning_ckpt(torch, ref_model, opt, in_path)
    report = convert(in_path, out_path, verbose=False)
    assert report["unmapped"] == []

    from care_tpu.models.loading import load_model
    models, loaded_opt = load_model(out_path, do_replace_paths=False,
                                    strict=True)
    (_, variables), = models

    rs = np.random.RandomState(43)
    x = rs.randn(2, 8, 24).astype(np.float32)
    with torch.no_grad():
        h = ref_model.encoder.Encoder_M(torch.from_numpy(x))
        ref_out = ref_model.encoder.backbone(h).numpy()

    import jax.numpy as jnp
    from care_tpu.models.encoders import get_encoder
    enc = get_encoder(loaded_opt)
    out = enc.apply({"params": variables["params"]["encoder"]},
                    [jnp.asarray(x)], deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out["encoder_hidden_states"]), ref_out,
        atol=3e-4, rtol=1e-4)


@pytest.mark.parametrize("decoder", ["SingleLayerRNNDecoder",
                                     "TopDownAttentionRNNDecoder"])
def test_convert_rnn_mha_attention_checkpoint(tmp_path, decoder):
    """``rnn_use_mha``: the RNN decoders swap their additive attention for
    a MultiHeadAttention sublayer (``RNN_single_layer.py:255-266``) — the
    converter dispatches on the ``SDPA.*`` keys."""
    torch = pytest.importorskip("torch")
    get_framework = import_reference()

    ref_opt = _ref_opt()
    ref_opt.update({"decoder": decoder, "rnn_type": "lstm",
                    "rnn_use_mha": True, "scheduled_sampling_start": -1})
    torch.manual_seed(3)
    ref_model = get_framework(dict(ref_opt))
    ref_model.eval()

    rs = np.random.RandomState(47)
    feats_np, input_ids_np = _decode_parity_inputs(rs)
    _convert_and_compare(torch, tmp_path, ref_model, _our_opt(ref_opt),
                         feats_np, input_ids_np)


def test_convert_rnn_multistream_additive_checkpoint(tmp_path):
    """fusion 'none' + two streams: the additive attention keeps one
    ``linear1_f`` per modality (``Attention.py:140-160``) — the converter
    maps every index.  (The reference's MultiLevelAttention variant is
    unconstructable dead code: ``RNN_single_layer.py:271`` always passes
    ``add_hybrid_attention_bias``, which its ``__init__`` rejects.)"""
    torch = pytest.importorskip("torch")
    get_framework = import_reference()

    ref_opt = _ref_opt()
    ref_opt.update({"decoder": "SingleLayerRNNDecoder", "rnn_type": "lstm",
                    "fusion": "none", "dim_i": 24,
                    "scheduled_sampling_start": -1})
    torch.manual_seed(5)
    ref_model = get_framework(dict(ref_opt))
    ref_model.eval()

    rs = np.random.RandomState(53)
    B = 3
    feats_np = [rs.randn(B, 8, 24).astype(np.float32),
                rs.randn(B, 8, 24).astype(np.float32)]
    input_ids_np = rs.randint(6, 40, (B, 11)).astype(np.int64)
    _convert_and_compare(torch, tmp_path, ref_model, _our_opt(ref_opt),
                         feats_np, input_ids_np)


def test_convert_from_teacher(tmp_path):
    """``--from-teacher``: an InterplayModel (mean-teacher) checkpoint
    carries both ``captioner.*`` and ``teacher_captioner.*``; the flag
    must convert the TEACHER copy (reference ``Wrapper.py`` EMA teacher).
    Teacher weights are built from a different seed so logit parity can
    only pass if the right module was selected."""
    torch = pytest.importorskip("torch")
    get_framework = import_reference()
    from convert_reference_ckpt import convert

    ref_opt = _ref_opt()
    torch.manual_seed(0)
    student = get_framework(dict(ref_opt))
    torch.manual_seed(99)
    teacher = get_framework(dict(ref_opt))
    student.eval(), teacher.eval()

    sd = {f"captioner.{k}": v for k, v in student.state_dict().items()}
    sd.update({f"teacher_captioner.{k}": v
               for k, v in teacher.state_dict().items()})
    opt = _our_opt(ref_opt)
    in_path = str(tmp_path / "ref.ckpt")
    torch.save({"state_dict": sd, "hyper_parameters": {"opt": opt}},
               in_path)

    out_path = str(tmp_path / "teacher.ckpt")
    report = convert(in_path, out_path, from_teacher=True, verbose=False)
    assert report["unmapped"] == []

    from care_tpu.models.loading import load_model
    models, _ = load_model(out_path, do_replace_paths=False, strict=True)
    (model, variables), = models

    rs = np.random.RandomState(59)
    feats_np, input_ids_np = _decode_parity_inputs(rs)
    with torch.no_grad():
        ref_out = teacher({
            "feats": [torch.from_numpy(f) for f in feats_np],
            "input_ids": torch.from_numpy(input_ids_np)})
        stu_out = student({
            "feats": [torch.from_numpy(f) for f in feats_np],
            "input_ids": torch.from_numpy(input_ids_np)})

    import jax.numpy as jnp
    out = model.apply(variables,
                      {"feats": [jnp.asarray(f) for f in feats_np],
                       "input_ids": jnp.asarray(
                           input_ids_np.astype(np.int32))},
                      deterministic=True)
    ours = np.asarray(out["logits"])
    np.testing.assert_allclose(ours, ref_out["logits"].numpy(),
                               atol=3e-4, rtol=1e-4)
    # and it must NOT match the student
    assert np.abs(ours - stu_out["logits"].numpy()).max() > 1e-2


@pytest.mark.slow
def test_convert_then_finetune(tmp_path):
    """The full switch-over story: a reference user's checkpoint not only
    serves, it SEEDS CONTINUED TRAINING — converted weights flow through
    ``--load_model_weights_from`` (train.py:104-113, mirroring reference
    ``train.py:34-36``) into our Trainer, and a short fit on correlated
    synthetic data lifts CIDEr from the transplanted starting point."""
    torch = pytest.importorskip("torch")
    get_framework = import_reference()
    from convert_reference_ckpt import convert
    from care_tpu.config import get_opt
    from care_tpu.data import get_loader
    from care_tpu.data.corpus import write_synthetic_dataset
    from care_tpu.training.trainer import Trainer

    opt = get_opt({
        "dataset": "MSRVTT", "method": "Transformer", "task": "Base",
        "feats": "ViT", "modality": "mi", "max_len": 12, "n_frames": 8,
        "batch_size": 16, "beam_size": 3, "epochs": 6,
        "learning_rate": 1e-3,
        "num_hidden_layers_decoder": 1,
        "final_overrides": {"dim_hidden": 128, "intermediate_size": 256,
                            "num_attention_heads": 4,
                            "hidden_dropout_prob": 0.1,
                            "encoder_dropout_prob": 0.1,
                            "attention_probs_dropout_prob": 0.0},
    }, read_vocab=False, resolve_paths=False)
    opt["dim_m"] = opt["dim_i"] = 24

    root, paths, corpus, refs = write_synthetic_dataset(
        str(tmp_path), opt, n_videos=60, correlated=True)
    opt["info_corpus"] = os.path.join(root, "info_corpus.pkl")
    opt["reference"] = os.path.join(root, "refs.pkl")
    for c, p in paths.items():
        opt[f"feats_{c}"] = [p]
    opt["vocab_size"] = len(corpus["info"]["itow"])
    opt["checkpoint_path"] = os.path.join(str(tmp_path), "exps")

    # a reference-side "trained" checkpoint with this exact architecture
    torch.manual_seed(0)
    ref_model = get_framework(dict(opt))
    in_path = str(tmp_path / "ref.ckpt")
    out_path = str(tmp_path / "converted.ckpt")
    _fake_lightning_ckpt(torch, ref_model, opt, in_path)
    report = convert(in_path, out_path, verbose=False)
    assert report["unmapped"] == []

    train_loader = get_loader(opt, "train")
    val_loader = get_loader(opt, "validate", is_validation=True,
                            not_shuffle=True)
    trainer = Trainer(opt, train_loader=train_loader,
                      val_loader=val_loader, references=refs,
                      vocab=corpus["info"]["itow"])
    trainer.init_model(next(iter(train_loader)))

    from care_tpu.models.loading import load_teacher_weights_into_student
    trainer.variables = load_teacher_weights_into_student(
        trainer.variables, out_path, None, verbose=False)

    before = trainer.validate(0)
    trainer.fit(epochs=opt["epochs"])
    after = trainer.validate(opt["epochs"])
    assert after["CIDEr"] > before["CIDEr"] + 0.2, (before, after)
