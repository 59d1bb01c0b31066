"""Model loading: checkpoint -> (model, variables, opt), with opt override,
cross-machine path rewriting, ensembles, and NACF teacher-weight surgery.

Parity targets: reference ``models/__init__.py`` — ``load_model`` (opt
override + base-data-path rewrite so others' checkpoints run locally,
``:93-152``), ensemble detection (``:35-90``), retrieval-db swap/ratio
plug-in (``:7-32``) and ``manually_load_pretrained_teacher_model``
(``:155-190``: copy shape-matching teacher params into a fresh student,
remapping vocabulary rows of embeddings/heads through the id mapping).
"""

import os
import pickle
from typing import Dict, List, Optional, Tuple

import numpy as np
from flax import traverse_util

from care_tpu import constants
from care_tpu.models import build_captioner
from care_tpu.training.checkpoints import load_checkpoint, save_checkpoint


def get_vocab_mapping(opt: dict, teacher_opt: dict):
    """Student-vocab-id -> teacher-vocab-id array (reference
    ``Translator.py:321-339``); None when vocabularies are identical."""
    if teacher_opt is None:
        return None
    with open(opt["info_corpus"], "rb") as f:
        vocab = pickle.load(f)["info"]["itow"]
    with open(teacher_opt["info_corpus"], "rb") as f:
        teacher_vocab = pickle.load(f)["info"]["itow"]
    if vocab == teacher_vocab:
        return None
    teacher_w2i = {v: k for k, v in teacher_vocab.items()}
    mapping = np.zeros(len(vocab), dtype=np.int64)
    for k, v in vocab.items():
        mapping[int(k)] = int(teacher_w2i[v])
    assert mapping[constants.PAD] == constants.PAD
    return mapping


def replace_paths(opt: dict, base_data_path: Optional[str] = None) -> dict:
    """Rewrite feature/corpus paths to the local data root
    (reference ``models/__init__.py:122-148``)."""
    ori = os.path.dirname(opt["info_corpus"])
    assert os.path.basename(ori) == opt["dataset"], (ori, opt["dataset"])
    ori = os.path.dirname(ori)
    now = base_data_path if base_data_path is not None \
        else constants.BASE_DATA_PATH

    def _replace(item):
        if isinstance(item, (list, tuple)):
            return [_replace(x) for x in item]
        assert isinstance(item, str)
        return item.replace(ori, now)

    for key in ["feats_a", "feats_m", "feats_i", "feats_o", "feats_t",
                "feats_r", "reference", "info_corpus"]:
        if key in opt and opt[key]:
            opt[key] = _replace(opt[key])
    return opt


def modify_opt_if_necessary(opt: dict, retrieval_datasets: List[str] = None,
                            retrieval_db_ratio: float = 100) -> dict:
    """Retrieval-database swap / corruption-ratio plug-in
    (reference ``models/__init__.py:7-32``)."""
    if retrieval_datasets:
        assert opt.get("feats_r") and "unique" in opt["feats_r"]
        d = os.path.dirname(opt["feats_r"])
        if retrieval_datasets == ["MSRVTT"]:
            opt["feats_r"] = os.path.join(d, "CLIP_ViT-B-32_unique.hdf5")
        else:
            opt["feats_r"] = os.path.join(
                d, "CLIP_ViT-B-32_{}_unique.hdf5".format(
                    "-".join(retrieval_datasets)))
    if retrieval_db_ratio < 100:
        for key in ("feats_r", "feats_t"):
            if opt.get(key):
                v = opt[key]
                if isinstance(v, (list, tuple)):
                    assert len(v) == 1
                    v = v[0]
                opt[key] = v.replace(".hdf5",
                                     "_ratio%.1f.hdf5" % retrieval_db_ratio)
    return opt


def load_model(checkpoint_path, new_opt_used_to_override: dict = None,
               do_replace_paths: bool = True,
               base_data_path: Optional[str] = None,
               return_spec: bool = False, strict: bool = True):
    """Load one checkpoint or an ensemble.

    Returns (models, opt): ``models`` is a list of (captioner, variables)
    pairs directly consumable by the translators. With ``return_spec`` an
    ``EnsembleSpec`` is returned as a third value (None for a single model);
    for heterogeneous-modality ensembles its merged opt unions the
    modalities and ``split_feats`` distributes a union-ordered batch
    (reference ``ModelEnsemble``, ``Wrapper.py:617-714``).
    """
    paths = (checkpoint_path if isinstance(checkpoint_path, (list, tuple))
             else [checkpoint_path])
    models = []
    all_opts = []
    for p in paths:
        raw, opt, _ = load_checkpoint(p)
        if new_opt_used_to_override:
            opt = {**opt, **new_opt_used_to_override}
        if do_replace_paths and opt.get("info_corpus"):
            opt = replace_paths(opt, base_data_path)
        model = build_captioner(opt)
        # restore into the correct pytree structure by re-initing a template
        # (strict like the reference's load_from_checkpoint(strict=True),
        # models/__init__.py:97; weight-init loads pass strict=False)
        variables = _restore_into_template(model, opt, raw, strict=strict)
        models.append((model, variables))
        all_opts.append(opt)

    spec = None
    merged_opt = all_opts[0]
    if len(all_opts) > 1:
        from care_tpu.models.ensemble import EnsembleSpec
        spec = EnsembleSpec(all_opts)
        merged_opt = {**all_opts[0], **{k: v for k, v in spec.opt.items()
                                        if v is not None}}
    if return_spec:
        return models, merged_opt, spec
    return models, merged_opt


def init_variables_template(model, opt):
    """Init the model's variable tree with tiny synthetic inputs (batch 1)
    — the canonical template both for checkpoint restore and for
    reference-weight transplantation (``models/transplant.py``)."""
    import jax
    import jax.numpy as jnp

    rs = np.random.RandomState(0)
    is_cnn = opt.get("encoder", "") in ("CNN1", "CNN2", "CNN3")
    feats = []
    for char in opt["modality"]:
        if char == "t" and not is_cnn:
            feats.append(jnp.asarray(rs.randint(
                6, opt["vocab_size"],
                (1, opt.get("retrieval_topk", 20), opt["max_len"])),
                jnp.int32))
        elif is_cnn:
            # dense-patch encoders consume [B, n_frames, n_layers,
            # n_patches] with n_patches == dim_t (Att_Encoder.py:49-62)
            feats.append(jnp.asarray(
                rs.randn(1, opt["n_frames"], 3, opt["dim_t"]), jnp.float32))
        else:
            feats.append(jnp.asarray(
                rs.randn(1, opt["n_frames"], opt[f"dim_{char}"]), jnp.float32))
    batch = {"feats": feats,
             "input_ids": jnp.ones((1, opt["max_len"] - 1), jnp.int32)}
    rng = jax.random.PRNGKey(0)
    return model.init({"params": rng, "dropout": rng, "sampling": rng},
                      batch, deterministic=True)


def _restore_into_template(model, opt, raw_state, strict=True, verbose=True):
    """Build an init template with tiny synthetic inputs, then graft the
    restored arrays into it (shapes must match).

    ``strict`` raises if the checkpoint is missing any template parameter
    (a renamed module / truncated checkpoint must not silently evaluate
    with fresh random weights — reference ``load_state_dict`` strictness,
    ``models/__init__.py:97``)."""
    import jax.numpy as jnp

    template = init_variables_template(model, opt)

    flat_t = traverse_util.flatten_dict(template, sep="/")
    flat_r = traverse_util.flatten_dict(raw_state, sep="/")
    missing = sorted(set(flat_t) - set(flat_r))
    extra = sorted(set(flat_r) - set(flat_t))
    if missing and strict:
        raise KeyError(
            f"checkpoint is missing {len(missing)} parameter(s) present in "
            f"the model: {missing[:10]}{'…' if len(missing) > 10 else ''}")
    if verbose and missing:
        print("- Missing Keys (kept at fresh init):", missing[:10])
    if verbose and extra:
        print("- Extra Keys in the Checkpoint:", extra[:10])
    out = {}
    for k, v in flat_t.items():
        if k in flat_r:
            rv = jnp.asarray(flat_r[k])
            assert rv.shape == v.shape, (k, rv.shape, v.shape)
            out[k] = rv
        else:
            out[k] = v
    return traverse_util.unflatten_dict(out, sep="/")


def load_teacher_weights_into_student(student_variables, teacher_ckpt_path,
                                      vocab_mapping=None, verbose=True):
    """NACF teacher init with shape-mismatch handling + vocab row remap
    (reference ``models/__init__.py:155-190``)."""
    raw, teacher_opt, _ = load_checkpoint(teacher_ckpt_path)
    flat_t = traverse_util.flatten_dict(raw, sep="/")
    flat_s = traverse_util.flatten_dict(student_variables, sep="/")

    extra = set(flat_t) - set(flat_s)
    missing = set(flat_s) - set(flat_t)
    if verbose and missing:
        print("- Unexpected Keys:", sorted(missing)[:10])
    if verbose and extra:
        print("- Extra Keys in the Checkpoint:", sorted(extra)[:10])

    out = {}
    for k, v in flat_s.items():
        if k in flat_t:
            tv = np.asarray(flat_t[k])
            if tv.shape == tuple(v.shape):
                out[k] = tv
            else:
                if verbose:
                    print(f"- Incompatible Shape of `{k}`: "
                          f"Student {tuple(v.shape)}; Teacher {tv.shape}")
                if ("word_embeddings" in k or "tgt_word_prj" in k) \
                        and vocab_mapping is not None:
                    if "tgt_word_prj" in k and tv.ndim == 2 \
                            and tv.shape[1] != v.shape[1]:
                        # flax kernel is (in, vocab): remap columns
                        out[k] = tv[:, vocab_mapping]
                    else:
                        out[k] = tv[vocab_mapping]
                else:
                    out[k] = v
        else:
            out[k] = v
    return traverse_util.unflatten_dict(out, sep="/")
