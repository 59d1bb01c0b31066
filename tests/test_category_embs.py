"""Category conditioning paths: id-embedding and GloVe category-embs."""

import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from care_tpu.config import get_opt
from care_tpu.data import get_loader
from care_tpu.data.corpus import write_synthetic_dataset, load_info_corpus


def test_use_category_embs_end_to_end(tmp_path):
    overrides = {
        "dataset": "MSRVTT", "method": "Transformer", "task": "Base",
        "feats": "ViT", "modality": "mi", "max_len": 12, "n_frames": 8,
        "batch_size": 4, "with_category": True, "use_category_embs": True,
        "dim_category": 6,
    }
    opt = get_opt(overrides, read_vocab=False, resolve_paths=False)
    assert opt["with_category"] and opt["use_category_embs"]
    opt["dim_m"], opt["dim_i"] = 16, 16

    root, paths, corpus, refs = write_synthetic_dataset(str(tmp_path), opt,
                                                        n_videos=12)
    # attach GloVe-style category embeddings to the corpus
    corpus["info"]["category_embeddings"] = np.random.RandomState(0).randn(
        20, 6).astype(np.float32)
    with open(os.path.join(root, "info_corpus.pkl"), "wb") as f:
        pickle.dump(corpus, f)

    opt["info_corpus"] = os.path.join(root, "info_corpus.pkl")
    opt["reference"] = os.path.join(root, "refs.pkl")
    for c, p in paths.items():
        opt[f"feats_{c}"] = [p]
    opt["vocab_size"] = len(corpus["info"]["itow"])

    loader = get_loader(opt, "train")
    batch = next(iter(loader))
    assert batch["category_embs"].shape == (4, 6)

    from care_tpu.models import build_captioner
    from care_tpu.training.trainer import device_batch
    model = build_captioner(opt)
    b = device_batch(batch)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, b)
    out = model.apply(variables, b, deterministic=True, collect_aux=False)
    assert np.isfinite(np.asarray(out["logits"])).all()

    # category embeddings actually influence the logits
    b2 = dict(b)
    b2["category_embs"] = b["category_embs"] + 10.0
    out2 = model.apply(variables, b2, deterministic=True, collect_aux=False)
    assert float(jnp.max(jnp.abs(out["logits"] - out2["logits"]))) > 1e-3


def test_category_id_embedding_path(tmp_path):
    overrides = {
        "dataset": "MSRVTT", "method": "Transformer", "task": "Base",
        "feats": "ViT", "modality": "mi", "max_len": 12, "n_frames": 8,
        "batch_size": 4, "with_category": True,
    }
    opt = get_opt(overrides, read_vocab=False, resolve_paths=False)
    opt["dim_m"], opt["dim_i"] = 16, 16
    root, paths, corpus, refs = write_synthetic_dataset(str(tmp_path), opt,
                                                        n_videos=12)
    opt["info_corpus"] = os.path.join(root, "info_corpus.pkl")
    opt["reference"] = os.path.join(root, "refs.pkl")
    for c, p in paths.items():
        opt[f"feats_{c}"] = [p]
    opt["vocab_size"] = len(corpus["info"]["itow"])

    loader = get_loader(opt, "train")
    batch = next(iter(loader))
    assert batch["category"].shape == (4, 1)

    from care_tpu.models import build_captioner
    from care_tpu.training.trainer import device_batch
    model = build_captioner(opt)
    b = device_batch(batch)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, b)
    out = model.apply(variables, b, deterministic=True, collect_aux=False)
    assert np.isfinite(np.asarray(out["logits"])).all()
