"""Score-parity rehearsal for the CIDEr north-star (BASELINE.md:24).

Real MSRVTT features don't exist in this environment, so this is the
closest achievable proxy: train the ACTUAL reference torch stack (model +
criterion, via ``reference_adapter.import_reference``) and our stack on the
SAME tiny synthetic correlated corpus, from the SAME transplanted initial
weights, with the SAME batch stream and hyperparameters (dropout off,
Adam + StepLR 0.9/epoch, wd 0) — then run each stack's own decode on the
test split and score both with the COCO metrics. The full score dicts must
match within tolerance, proving the two training+decoding+eval pipelines
are exchangeable end to end.
"""

import numpy as np
import pytest

from care_tpu import constants
from care_tpu.config import get_opt
from care_tpu.data import get_loader
from care_tpu.data.corpus import write_synthetic_dataset
from care_tpu.metrics import COCOScorer
from care_tpu.utils.logger import to_sentence

from reference_adapter import (import_reference,
                               transplant_transformer_weights,
                               transplant_highwaybn_encoder,
                               transplant_length_predictor)

EPOCHS = 12
LR = 5e-4
GAMMA = 0.9


def _make_env(tmp_path):
    overrides = {
        "dataset": "MSRVTT", "method": "Transformer", "task": "Base",
        "feats": "ViT", "modality": "mi",
        # YAML overlays overwrite plain overrides (reference CLI semantics);
        # force the tiny deterministic shape post-YAML
        "final_overrides": {
            "max_len": 12, "n_frames": 8, "batch_size": 8,
            "beam_size": 3, "topk": 1, "beam_alpha": 1.0,
            "num_hidden_layers_decoder": 1, "dim_hidden": 64,
            "num_attention_heads": 4, "intermediate_size": 128,
            "encoder_dropout_prob": 0.0, "hidden_dropout_prob": 0.0,
            "attention_probs_dropout_prob": 0.0, "trainable_pe": True,
            "crits": ["lang"],
        },
    }
    opt = get_opt(overrides, read_vocab=False, resolve_paths=False)
    opt["dim_m"], opt["dim_i"] = 32, 16

    import os
    root, paths, corpus, refs = write_synthetic_dataset(
        str(tmp_path), opt, n_videos=24, correlated=True)
    opt["info_corpus"] = os.path.join(root, "info_corpus.pkl")
    opt["reference"] = os.path.join(root, "refs.pkl")
    for c, p in paths.items():
        opt[f"feats_{c}"] = [p]
    opt["vocab_size"] = len(corpus["info"]["itow"])
    return opt, corpus, refs


def _ref_opt_from(opt):
    """The subset of keys the reference model/criterion constructors read."""
    keys = ["decoding_type", "fusion", "modality", "dim_m", "dim_i",
            "dim_hidden", "encoder_dropout_prob", "hidden_dropout_prob",
            "attention_probs_dropout_prob", "num_attention_heads",
            "intermediate_size", "hidden_act", "layer_norm_eps",
            "num_hidden_layers_decoder", "vocab_size", "max_len",
            "n_frames", "trainable_pe", "enhance_input", "watch", "crits",
            "beam_size", "topk", "beam_alpha"]
    ref_opt = {k: opt[k] for k in keys if k in opt}
    ref_opt.update({"decoder": "TransformerDecoder", "cls_head": "NaiveHead",
                    "encoder": "Embedder", "feats": "",
                    "label_smoothing": opt.get("label_smoothing", 0.0)})
    return ref_opt


def _to_torch(torch, batch):
    t = {"feats": [torch.from_numpy(np.asarray(f)) for f in batch["feats"]],
         "input_ids": torch.from_numpy(
             np.asarray(batch["input_ids"])).long()}
    if "labels" in batch:
        t["labels"] = torch.from_numpy(np.asarray(batch["labels"])).long()
    return t


def _make_care_env(tmp_path):
    overrides = {
        "dataset": "MSRVTT", "method": "Transformer", "task": "CARE",
        "feats": "ViT", "decoder_modality_flags": "V",
        "predictor_modality_flags": "V",
        "final_overrides": {
            "max_len": 12, "n_frames": 8, "batch_size": 8,
            "beam_size": 3, "topk": 1, "beam_alpha": 1.0,
            "num_hidden_layers_decoder": 1, "dim_hidden": 64,
            "num_attention_heads": 4, "intermediate_size": 128,
            "encoder_dropout_prob": 0.0, "hidden_dropout_prob": 0.0,
            "attention_probs_dropout_prob": 0.0, "trainable_pe": True,
            "attribute_prediction_k": 16, "use_attr_topk": 4,
            "lowlr_start_epoch": 6, "weight_decay": 0.0,
        },
    }
    opt = get_opt(overrides, read_vocab=False, resolve_paths=False)
    opt["dim_m"], opt["dim_i"] = 32, 16

    import os
    root, paths, corpus, refs = write_synthetic_dataset(
        str(tmp_path), opt, n_videos=24, correlated=True)
    opt["info_corpus"] = os.path.join(root, "info_corpus.pkl")
    opt["reference"] = os.path.join(root, "refs.pkl")
    for c, p in paths.items():
        opt[f"feats_{c}"] = [p]
    opt["vocab_size"] = len(corpus["info"]["itow"])
    return opt, corpus, refs


def _care_ref_opt_from(opt):
    ref_opt = _ref_opt_from(opt)
    care_keys = [
        "crits", "attribute_prediction", "attribute_prediction_k",
        "attribute_prediction_flags", "attribute_prediction_mean_pooling",
        "attribute_prediction_channel_concat",
        "attribute_prediction_sparse_sampling", "use_attr", "use_attr_type",
        "use_attr_topk", "use_attr_flags", "add_hybrid_attention_bias",
        "attr_layer_pos", "predictors_to_be_added", "learning_rate",
        "low_learning_rate", "lowlr_start_epoch", "weight_decay",
        "lr_decay", "lr_step_size", "decoding_type",
    ]
    for k in care_keys:
        if k in opt:
            ref_opt[k] = opt[k]
    return ref_opt


def test_care_flagship_training_and_scores_match_reference(tmp_path):
    """The CARE north-star recipe itself (reference
    ``models/Wrapper.py:460-547``): noisy-OR MIL concept detection + lang
    loss, semantic container (G1Lc + hybrid bias), and the dual-Adam
    low-LR switch at ``lowlr_start_epoch`` — both stacks trained from the
    same transplanted init on the same batch stream, then decoded + COCO
    scored with their own engines."""
    torch = pytest.importorskip("torch")
    get_framework = import_reference()
    from misc.Crit import get_criterion as ref_get_criterion
    from models.Translator import get_translator as ref_get_translator

    import jax
    import jax.numpy as jnp
    import optax
    from care_tpu.models import build_captioner
    from care_tpu.training.losses import Criterion
    from care_tpu.training.optim import make_adam, make_dual_adam, \
        make_lr_schedule

    opt, corpus, refs = _make_care_env(tmp_path)
    itow = corpus["info"]["itow"]
    ref_opt = _care_ref_opt_from(opt)
    switch_epoch = opt["lowlr_start_epoch"]
    assert 0 < switch_epoch < EPOCHS  # the switch actually happens mid-run

    torch.manual_seed(0)
    ref_model = get_framework(dict(ref_opt))
    ref_model.eval()
    ref_crit = ref_get_criterion({**ref_opt, "calculate_mAP": False})
    # the reference hardcodes an F1@{5..50} recording ladder
    # (crit_attribute.py:20) that crashes for K=16 concepts; clamp it like
    # our Criterion does — it records metrics only, never touches the loss
    for c in ref_crit.crit_objects:
        if hasattr(c, "topk_list"):
            c.topk_list = [k for k in c.topk_list
                           if k <= opt["attribute_prediction_k"]] or [4]

    model = build_captioner(opt)
    train_loader = get_loader(opt, "train")
    first = next(iter(train_loader))
    batch0 = {"feats": [jnp.asarray(np.asarray(f)) for f in first["feats"]],
              "input_ids": jnp.asarray(np.asarray(first["input_ids"]))}
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng,
                            "sampling": rng}, batch0, deterministic=True)
    params = jax.tree.map(np.asarray, variables["params"])
    params = transplant_transformer_weights(ref_model.state_dict(), params,
                                            ref_opt)
    params = jax.tree.map(lambda x: jnp.array(np.array(x, copy=True)),
                          params)

    criterion = Criterion(opt)
    steps_per_epoch = len(train_loader)

    # pre-switch: one Adam over everything at the base LR; post-switch: the
    # fresh dual Adam (low LR on encoder + concept detector), its schedule
    # offset to the switch step like the reference's always-stepped StepLR
    lr_opt = {**opt, "lr_scheduler_type": "linear"}
    tx1 = make_adam(lr_opt, make_lr_schedule(lr_opt, steps_per_epoch),
                    params)
    tx2 = make_dual_adam(lr_opt, params, steps_per_epoch,
                         offset_steps=switch_epoch * steps_per_epoch)
    opt_state = tx1.init(params)

    def make_step(tx):
        @jax.jit
        def train_step(params, opt_state, batch):
            def loss_fn(p):
                outputs = model.apply({"params": p}, batch,
                                      deterministic=True, collect_aux=False)
                total, _, _ = criterion({**outputs, **batch}, None)
                return total
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, loss
        return train_step

    step1, step2 = make_step(tx1), make_step(tx2)

    # reference dual optimizer exactly as Wrapper.configure_optimizers
    lr, low_lr = opt["learning_rate"], opt["low_learning_rate"]
    wd = opt["weight_decay"]
    low_names = ["encoder", "predictor.nets.0"]
    low_params, rest = [], []
    for n, p in ref_model.named_parameters():
        if p.requires_grad:
            (low_params if any(s in n for s in low_names)
             else rest).append(p)
    ref_optim1 = torch.optim.Adam(
        [p for p in ref_model.parameters() if p.requires_grad],
        lr=lr, weight_decay=wd)
    ref_optim2 = torch.optim.Adam(
        [{"params": low_params, "lr": low_lr},
         {"params": rest, "lr": lr}], weight_decay=wd)
    gamma = opt.get("lr_decay", 0.9)
    ref_sched1 = torch.optim.lr_scheduler.StepLR(ref_optim1, step_size=1,
                                                 gamma=gamma)
    ref_sched2 = torch.optim.lr_scheduler.StepLR(ref_optim2, step_size=1,
                                                 gamma=gamma)

    first_epoch_pairs = []
    switched = False
    for epoch in range(EPOCHS):
        if not switched and epoch >= switch_epoch:
            opt_state = tx2.init(params)
            switched = True
        train_loader.set_epoch(epoch)
        for batch in train_loader:
            tb = _to_torch(torch, batch)
            tb["labels_attr"] = torch.from_numpy(
                np.asarray(batch["labels_attr"])).float()
            out = ref_model(tb, current_epoch=epoch)
            ref_loss = ref_crit.get_loss({**out, **tb})
            ref_optim = ref_optim2 if epoch >= switch_epoch else ref_optim1
            ref_optim.zero_grad()
            ref_loss.backward()
            ref_optim.step()

            jb = {"feats": [jnp.asarray(np.asarray(f))
                            for f in batch["feats"]],
                  "input_ids": jnp.asarray(np.asarray(batch["input_ids"])),
                  "labels": jnp.asarray(np.asarray(batch["labels"])),
                  "labels_attr": jnp.asarray(
                      np.asarray(batch["labels_attr"]))}
            step = step2 if switched else step1
            params, opt_state, our_loss = step(params, opt_state, jb)
            if epoch == 0:
                first_epoch_pairs.append((float(ref_loss.detach()),
                                          float(our_loss)))
        ref_sched1.step()
        ref_sched2.step()
    assert switched

    r0, o0 = first_epoch_pairs[0]
    assert abs(r0 - o0) < 1e-3 * max(1.0, abs(r0)), (r0, o0)
    for r, o in first_epoch_pairs:
        assert abs(r - o) < 0.05 * max(1.0, abs(r)), first_epoch_pairs

    # --- decode + COCO score with each stack's own engine ---------------
    test_loader = get_loader(opt, "test", not_shuffle=True)
    ref_tr = ref_get_translator({**ref_opt, "decoding_type": "ARFormer"})

    from care_tpu.decoding.translator import get_translator
    our_tr = get_translator(opt)
    our_vars = {"params": params}

    ref_preds, our_preds = {}, {}
    with torch.no_grad():
        for batch in test_loader:
            tb = _to_torch(torch, batch)
            rh, _ = ref_tr.translate_batch([ref_model], tb)
            jb = {"feats": [jnp.asarray(np.asarray(f))
                            for f in batch["feats"]]}
            oh, _ = our_tr.translate_batch([(model, our_vars)], jb)
            for i, vid in enumerate(batch["video_ids"]):
                ref_preds[vid] = [{"image_id": vid,
                                   "caption": to_sentence(rh[i][0], itow)}]
                our_preds[vid] = [{"image_id": vid,
                                   "caption": to_sentence(oh[i][0], itow)}]

    scorer = COCOScorer(verbose=False)
    ids = list(ref_preds.keys())
    ref_scores, _ = scorer.score(refs, ref_preds, ids)
    our_scores, _ = scorer.score(refs, our_preds, ids)

    for key in ["Bleu_4", "METEOR", "ROUGE_L", "CIDEr"]:
        assert abs(ref_scores[key] - our_scores[key]) <= 0.02, (
            key, ref_scores, our_scores)
    # lower floor than the Base rehearsal: the low-LR switch deliberately
    # slows the encoder/detector after epoch 6 (deterministic: ref 0.230)
    assert ref_scores["CIDEr"] > 0.2, ref_scores
    assert our_scores["CIDEr"] > 0.2, our_scores


def _make_nar_env(tmp_path):
    """NACF recipe on the synthetic corpus: MLM + visual-word two-stage
    targets (``dataloader.py:583-659``) + length KL, EncoderWithHighWayBN,
    TwoStage decoder, MaskPredict decode with CT templates."""
    overrides = {
        "dataset": "MSRVTT", "method": "NACF", "task": "Base",
        "feats": "ViT", "modality": "mi",
        "final_overrides": {
            "max_len": 12, "n_frames": 8, "batch_size": 8,
            "length_beam_size": 4, "iterations": 3, "beam_alpha": 1.0,
            "num_hidden_layers_decoder": 1, "dim_hidden": 64,
            "num_attention_heads": 4, "intermediate_size": 128,
            "encoder_dropout_prob": 0.0, "hidden_dropout_prob": 0.0,
            "attention_probs_dropout_prob": 0.0, "trainable_pe": True,
            "with_teacher_during_training": False,
            "load_teacher_weights": False,
            "masking_decision": False, "no_candidate_decision": False,
            "weight_decay": 0.0,
        },
    }
    opt = get_opt(overrides, read_vocab=False, resolve_paths=False)
    opt["dim_m"], opt["dim_i"] = 32, 16

    import os
    # consistent=True: one (noun, verb, noun) triple per video — the NAR
    # MLM recipe cannot resolve 3 unrelated captions per video on a corpus
    # this small (the AR rehearsals can)
    root, paths, corpus, refs = write_synthetic_dataset(
        str(tmp_path), opt, n_videos=24, correlated=True, consistent=True)
    opt["info_corpus"] = os.path.join(root, "info_corpus.pkl")
    opt["reference"] = os.path.join(root, "refs.pkl")
    for c, p in paths.items():
        opt[f"feats_{c}"] = [p]
    opt["vocab_size"] = len(corpus["info"]["itow"])
    return opt, corpus, refs


def _nar_ref_opt_from(opt):
    ref_opt = _ref_opt_from(opt)
    ref_opt.update({
        "encoder": "EncoderWithHighWayBN",
        "decoder": "TwoStageTransformerDecoder",
        "decoding_type": "NARFormer",
        "paradigm": opt.get("paradigm", "mp"),
        "iterations": opt["iterations"],
        "length_beam_size": opt["length_beam_size"],
        "length_bias": opt.get("length_bias", 0),
        "visual_word_generation": True,
        "demand": opt["demand"], "use_ct": opt["use_ct"],
        "nv_weights": opt["nv_weights"],
        "length_prediction": True,
        "masking_decision": opt["masking_decision"],
        "no_candidate_decision": opt["no_candidate_decision"],
        "info_corpus": opt["info_corpus"],
    })
    return ref_opt


def test_nacf_training_and_scores_match_reference(tmp_path):
    """The NAR training recipe end to end (round-4 task; reference
    ``Wrapper.py:287-299`` + ``dataloader.py:583-659``): β-range MLM +
    visual-word two-stage targets + length-KL training of the NACF stack
    (HighWayBN encoder, TwoStage decoder, length predictor) on the same
    synthetic corpus from the same transplanted init in both stacks, then
    length-beam + CT-template MaskPredict decode — without AND with an AR
    teacher attached for masking decisions — scored with the COCO metrics;
    score dicts must match."""
    torch = pytest.importorskip("torch")
    import types as _types
    get_framework = import_reference()
    from misc.Crit import get_criterion as ref_get_criterion
    from models.Translator import get_translator as ref_get_translator

    import jax
    import jax.numpy as jnp
    import optax
    from care_tpu.models import build_captioner
    from care_tpu.training.losses import Criterion

    # constant LR, longer run than the AR rehearsals: the two-stage MLM
    # must escape the stage-1 "predict MASK everywhere" attractor, which
    # on this tiny corpus takes more optimisation than StepLR 0.9/epoch
    # leaves alive (both stacks use the SAME optimizer, so parity is
    # unaffected by the choice)
    NAR_EPOCHS = 40

    opt, corpus, refs = _make_nar_env(tmp_path)
    itow = corpus["info"]["itow"]
    assert opt["crits"] == ["lang", "length"]
    ref_opt = _nar_ref_opt_from(opt)

    torch.manual_seed(0)
    ref_model = get_framework(dict(ref_opt))
    ref_model.eval()          # dropout off; BN in eval mode (we mirror by
    ref_crit = ref_get_criterion(dict(ref_opt))   # not mutating batch_stats)

    model = build_captioner(opt)
    train_loader = get_loader(opt, "train")
    first = next(iter(train_loader))
    batch0 = {"feats": [jnp.asarray(np.asarray(f)) for f in first["feats"]],
              "input_ids": [jnp.asarray(np.asarray(x))
                            for x in first["input_ids"]]}
    rng = jax.random.PRNGKey(0)
    variables = jax.tree.map(np.asarray, model.init(
        {"params": rng, "dropout": rng, "sampling": rng}, batch0,
        deterministic=True))
    variables = transplant_highwaybn_encoder(ref_model.state_dict(),
                                             variables, ref_opt)
    variables["params"] = transplant_transformer_weights(
        ref_model.state_dict(), variables["params"],
        {**ref_opt, "modality": ""})
    variables["params"] = transplant_length_predictor(
        ref_model.state_dict(), variables["params"])
    # zero-copy hazard: see test_training_and_coco_scores_match_reference
    variables = jax.tree.map(lambda x: jnp.array(np.array(x, copy=True)),
                             variables)
    params, extra = variables["params"], {
        k: v for k, v in variables.items() if k != "params"}

    criterion = Criterion(opt)
    tx = optax.adam(learning_rate=LR)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, batch):
        def loss_fn(p):
            outputs = model.apply({"params": p, **extra}, batch,
                                  deterministic=True, collect_aux=False)
            total, _, _ = criterion({**outputs, **batch}, None)
            return total
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    ref_optim = torch.optim.Adam(ref_model.parameters(), lr=LR,
                                 weight_decay=0.0)

    def to_torch_nar(batch):
        return {
            "feats": [torch.from_numpy(np.asarray(f))
                      for f in batch["feats"]],
            "input_ids": [torch.from_numpy(np.asarray(x)).long()
                          for x in batch["input_ids"]],
            "labels": [torch.from_numpy(np.asarray(x)).long()
                       for x in batch["labels"]],
            "length_target": torch.from_numpy(
                np.asarray(batch["length_target"])).float(),
        }

    first_epoch_pairs = []
    final_pair = None
    for epoch in range(NAR_EPOCHS):
        train_loader.set_epoch(epoch)
        for batch in train_loader:
            tb = to_torch_nar(batch)
            out = ref_model(tb, current_epoch=epoch)
            ref_loss = ref_crit.get_loss({**out, **tb})
            ref_optim.zero_grad()
            ref_loss.backward()
            ref_optim.step()

            jb = {"feats": [jnp.asarray(np.asarray(f))
                            for f in batch["feats"]],
                  "input_ids": [jnp.asarray(np.asarray(x))
                                for x in batch["input_ids"]],
                  "labels": [jnp.asarray(np.asarray(x))
                             for x in batch["labels"]],
                  "length_target": jnp.asarray(
                      np.asarray(batch["length_target"]))}
            params, opt_state, our_loss = train_step(params, opt_state, jb)
            if epoch == 0:
                first_epoch_pairs.append((float(ref_loss.detach()),
                                          float(our_loss)))
            final_pair = (float(ref_loss.detach()), float(our_loss))

    r0, o0 = first_epoch_pairs[0]
    assert abs(r0 - o0) < 1e-3 * max(1.0, abs(r0)), (r0, o0)
    for r, o in first_epoch_pairs:
        assert abs(r - o) < 0.05 * max(1.0, abs(r)), first_epoch_pairs
    # the recipe optimises on both stacks (MLM + visual-word + length KL),
    # and the final losses stay in the same regime after 240 steps
    assert final_pair[0] < 0.2 * r0, (r0, final_pair)
    assert final_pair[1] < 0.2 * o0, (o0, final_pair)
    assert abs(final_pair[0] - final_pair[1]) < 0.5 * max(final_pair), \
        final_pair

    # --- AR teacher (identical transplanted weights on both sides) -------
    t_ref_opt = _ref_opt_from(opt)
    t_ref_opt.update({"decoding_type": "ARFormer", "crits": ["lang"],
                      "info_corpus": opt["info_corpus"]})
    torch.manual_seed(5)
    ref_teacher = get_framework(dict(t_ref_opt))
    ref_teacher.eval()

    t_overrides = {
        "dataset": "MSRVTT", "method": "Transformer", "task": "Base",
        "feats": "ViT", "modality": "mi",
        "final_overrides": {
            "max_len": opt["max_len"], "n_frames": opt["n_frames"],
            "num_hidden_layers_decoder": 1, "dim_hidden": 64,
            "num_attention_heads": 4, "intermediate_size": 128,
            "encoder_dropout_prob": 0.0, "hidden_dropout_prob": 0.0,
            "attention_probs_dropout_prob": 0.0, "trainable_pe": True,
        },
    }
    t_opt = get_opt(t_overrides, read_vocab=False, resolve_paths=False)
    t_opt.update({"dim_m": opt["dim_m"], "dim_i": opt["dim_i"],
                  "vocab_size": opt["vocab_size"],
                  "info_corpus": opt["info_corpus"]})
    teacher_model = build_captioner(t_opt)
    t_batch0 = {"feats": batch0["feats"],
                "input_ids": jnp.ones((8, opt["max_len"] - 1), jnp.int32)}
    t_vars = jax.tree.map(np.asarray, teacher_model.init(
        {"params": rng, "dropout": rng, "sampling": rng}, t_batch0,
        deterministic=True))
    t_vars["params"] = transplant_transformer_weights(
        ref_teacher.state_dict(), t_vars["params"], t_ref_opt)
    t_vars = jax.tree.map(lambda x: jnp.array(np.array(x, copy=True)),
                          t_vars)

    # --- decode + COCO score, with and without the teacher ---------------
    test_loader = get_loader(opt, "test", not_shuffle=True)
    from care_tpu.decoding.translator import get_translator
    from care_tpu.models.loading import get_vocab_mapping
    assert get_vocab_mapping(opt, t_opt) is None   # same corpus, no remap
    our_vars = {"params": params, **extra}
    scorer = COCOScorer(verbose=False)

    for with_teacher in (False, True):
        d_opt = dict(opt)
        d_ref_opt = dict(ref_opt)
        if with_teacher:
            d_opt["masking_decision"] = True
            d_ref_opt["masking_decision"] = True
        ref_tr = ref_get_translator(d_ref_opt)
        our_tr = get_translator(d_opt)
        wrapper = _types.SimpleNamespace(captioner=ref_teacher,
                                         get_opt=lambda: dict(t_ref_opt))
        ref_preds, our_preds = {}, {}
        with torch.no_grad():
            for batch in test_loader:
                tfeats = [torch.from_numpy(np.asarray(f))
                          for f in batch["feats"]]
                rh, _ = ref_tr.translate_batch(
                    [ref_model], {"feats": tfeats},
                    teacher_model_wrapper=(wrapper if with_teacher
                                           else None), vocab=itow)
                jb = {"feats": [jnp.asarray(np.asarray(f))
                                for f in batch["feats"]]}
                oh, _ = our_tr.translate_batch(
                    [(model, our_vars)], jb,
                    teacher=((teacher_model, t_vars) if with_teacher
                             else None))
                for i, vid in enumerate(batch["video_ids"]):
                    ref_preds[vid] = [{"image_id": vid, "caption":
                                       to_sentence(rh[i][0], itow)}]
                    our_preds[vid] = [{"image_id": vid, "caption":
                                       to_sentence(oh[i][0], itow)}]

        ids = list(ref_preds.keys())
        ref_scores, _ = scorer.score(refs, ref_preds, ids)
        our_scores, _ = scorer.score(refs, our_preds, ids)
        # looser than the AR rehearsals (0.02 @ 72 steps): 240 Adam steps
        # of independent f32 accumulation drift chaotically before decode
        # amplifies near-ties into different captions.  Exact decode
        # equality on IDENTICAL weights is locked separately
        # (test_reference_decode_parity.py); this asserts the trained
        # score landscape stays exchangeable.
        for key in ["Bleu_4", "METEOR", "ROUGE_L", "CIDEr"]:
            assert abs(ref_scores[key] - our_scores[key]) <= 0.3, (
                with_teacher, key, ref_scores, our_scores)
        # the NAR recipe must actually have learned the (consistent)
        # corpus on both stacks — probe trajectory on this env: CIDEr
        # ~0.9 @30 epochs, ~2.4 @40
        assert ref_scores["CIDEr"] > 0.8, (with_teacher, ref_scores)
        assert our_scores["CIDEr"] > 0.8, (with_teacher, our_scores)


def test_training_and_coco_scores_match_reference(tmp_path):
    torch = pytest.importorskip("torch")
    get_framework = import_reference()
    from misc.Crit import get_criterion as ref_get_criterion
    from models.Translator import get_translator as ref_get_translator

    import jax
    import jax.numpy as jnp
    import optax
    from care_tpu.models import build_captioner
    from care_tpu.training.losses import Criterion

    opt, corpus, refs = _make_env(tmp_path)
    itow = corpus["info"]["itow"]
    ref_opt = _ref_opt_from(opt)

    torch.manual_seed(0)
    ref_model = get_framework(dict(ref_opt))
    ref_model.eval()          # dropout off; grads still flow
    ref_crit = ref_get_criterion({**ref_opt,
                                  "calculate_mAP": False})

    model = build_captioner(opt)
    train_loader = get_loader(opt, "train")
    first = next(iter(train_loader))
    batch0 = {"feats": [jnp.asarray(np.asarray(f)) for f in first["feats"]],
              "input_ids": jnp.asarray(np.asarray(first["input_ids"]))}
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng,
                            "sampling": rng}, batch0, deterministic=True)
    params = jax.tree.map(np.asarray, variables["params"])
    params = transplant_transformer_weights(ref_model.state_dict(), params,
                                            ref_opt)
    # jnp.asarray on CPU is ZERO-COPY: the transplanted leaves are views of
    # the torch parameter buffers, and ref_optim.step() would mutate our
    # params in place — force a real copy
    params = jax.tree.map(lambda x: jnp.array(np.array(x, copy=True)),
                          params)

    criterion = Criterion(opt)
    steps_per_epoch = len(train_loader)
    sched = lambda step: LR * (GAMMA ** (step // steps_per_epoch))
    tx = optax.adam(learning_rate=sched)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, batch):
        def loss_fn(p):
            outputs = model.apply({"params": p}, batch, deterministic=True,
                                  collect_aux=False)
            total, _, _ = criterion({**outputs, **batch}, None)
            return total
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    ref_optim = torch.optim.Adam(ref_model.parameters(), lr=LR,
                                 weight_decay=0.0)
    ref_sched = torch.optim.lr_scheduler.StepLR(ref_optim, step_size=1,
                                                gamma=GAMMA)

    first_epoch_pairs = []
    for epoch in range(EPOCHS):
        train_loader.set_epoch(epoch)
        for batch in train_loader:
            tb = _to_torch(torch, batch)
            out = ref_model(tb, current_epoch=epoch)
            ref_loss = ref_crit.get_loss({**out, **tb})
            ref_optim.zero_grad()
            ref_loss.backward()
            ref_optim.step()

            jb = {"feats": [jnp.asarray(np.asarray(f))
                            for f in batch["feats"]],
                  "input_ids": jnp.asarray(np.asarray(batch["input_ids"])),
                  "labels": jnp.asarray(np.asarray(batch["labels"]))}
            params, opt_state, our_loss = train_step(params, opt_state, jb)
            if epoch == 0:
                first_epoch_pairs.append((float(ref_loss.detach()),
                                          float(our_loss)))
        ref_sched.step()

    # loss semantics lock: identical init + identical batches => the very
    # first losses are equal, and the whole first epoch tracks closely
    r0, o0 = first_epoch_pairs[0]
    assert abs(r0 - o0) < 1e-3 * max(1.0, abs(r0)), (r0, o0)
    for r, o in first_epoch_pairs:
        assert abs(r - o) < 0.05 * max(1.0, abs(r)), first_epoch_pairs

    # --- decode the test split with each stack's own engine --------------
    test_loader = get_loader(opt, "test", not_shuffle=True)
    ref_tr = ref_get_translator({**ref_opt, "decoding_type": "ARFormer"})

    from care_tpu.decoding.translator import get_translator
    our_tr = get_translator(opt)
    our_vars = {"params": params}

    ref_preds, our_preds = {}, {}
    with torch.no_grad():
        for batch in test_loader:
            tb = _to_torch(torch, batch)
            rh, _ = ref_tr.translate_batch([ref_model], tb)
            jb = {"feats": [jnp.asarray(np.asarray(f))
                            for f in batch["feats"]]}
            oh, _ = our_tr.translate_batch([(model, our_vars)], jb)
            for i, vid in enumerate(batch["video_ids"]):
                ref_preds[vid] = [{"image_id": vid,
                                   "caption": to_sentence(rh[i][0], itow)}]
                our_preds[vid] = [{"image_id": vid,
                                   "caption": to_sentence(oh[i][0], itow)}]

    scorer = COCOScorer(verbose=False)
    ids = list(ref_preds.keys())
    ref_scores, _ = scorer.score(refs, ref_preds, ids)
    our_scores, _ = scorer.score(refs, our_preds, ids)

    # the north-star tolerance is 0.5 CIDEr points (x100 scale) on real
    # MSRVTT; on this tiny corpus we require the full dict to 2 points
    for key in ["Bleu_4", "METEOR", "ROUGE_L", "CIDEr"]:
        assert abs(ref_scores[key] - our_scores[key]) <= 0.02, (
            key, ref_scores, our_scores)

    # and training must actually have learned something on both stacks
    assert ref_scores["CIDEr"] > 0.25, ref_scores
    assert our_scores["CIDEr"] > 0.25, our_scores
