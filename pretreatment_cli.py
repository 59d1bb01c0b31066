"""Pretreatment CLI: raw annotations/videos -> the training artifacts.

Parity target: the reference ``pretreatment/`` scripts
(``prepare_corpora.py``, ``extract_frames_from_videos.py``,
``clip_feats.py``, ``clip_text_embs.py``, ``clip_retrieval.py``) as one
driver with subcommands. Zero-egress: all inputs (annotation files, CLIP
checkpoints, GloVe vectors) must exist locally.

    python pretreatment_cli.py corpora --dataset MSRVTT \
        --annotation videodatainfo.json --out_dir data/MSRVTT
    python pretreatment_cli.py frames --video_dir vids/ --out_dir frames/
    python pretreatment_cli.py image_feats --frames_dir frames/ \
        --clip_ckpt ViT-B-32.pt --out feats/CLIP_ViT-B-32.hdf5
    python pretreatment_cli.py text_embs --corpus_dir data/MSRVTT \
        --clip_ckpt ViT-B-32.pt --bpe bpe_simple_vocab_16e6.txt.gz \
        --out text_embs/CLIP_ViT-B-32.hdf5
    python pretreatment_cli.py retrieval --corpus_dir data/MSRVTT \
        --image_embs feats/CLIP_ViT-B-32.hdf5 \
        --text_embs text_embs/CLIP_ViT-B-32.hdf5 \
        --out retrieval/CLIP_ViT-B-32_unique.hdf5
    python pretreatment_cli.py glove --glove_txt glove.6B.300d.txt \
        --corpus_dir data/MSRVTT --out data/MSRVTT/glove_embs.npy
"""

import argparse
import os
import pickle

import numpy as np


def cmd_corpora(args):
    from care_tpu.pretreatment import dataset_annotations as da
    from care_tpu.pretreatment.corpora import (prepare_corpus,
                                               build_references, save_corpus)
    if args.dataset == "MSRVTT":
        out = da.preprocess_msrvtt(args.annotation)
    elif args.dataset == "MSVD":
        out = da.preprocess_msvd(args.annotation, args.mapping)
    else:
        out = da.preprocess_vatex(args.annotation, args.val_annotation,
                                  args.mapping, args.frames_root)

    corpus = prepare_corpus(out["raw_caps_train"], out["raw_caps_all"],
                            out["split"], count_thr=args.count_thr,
                            itoc=out.get("itoc"),
                            attribute_first=not args.no_attribute_first)
    if "vid2id" in out:
        corpus["info"]["vid2id"] = out["vid2id"]
    if "split_category" in out:
        corpus["info"]["split_category"] = out["split_category"]

    os.makedirs(args.out_dir, exist_ok=True)
    save_corpus(os.path.join(args.out_dir, "info_corpus.pkl"), corpus)
    refs = out.get("references") or build_references(out["raw_caps_all"])
    with open(os.path.join(args.out_dir, "refs.pkl"), "wb") as f:
        pickle.dump(refs, f)
    print("- wrote", os.path.join(args.out_dir, "info_corpus.pkl"),
          f"(vocab={len(corpus['info']['itow'])})")


def cmd_frames(args):
    from care_tpu.pretreatment.frames import extract_frames_for_dataset
    n = extract_frames_for_dataset(args.video_dir, args.out_dir,
                                   fps=args.fps)
    print(f"- extracted {n} frames")


def _load_clip(ckpt_path):
    import torch
    from care_tpu.pretreatment.clip import convert_openai_clip_state_dict
    sd = torch.load(ckpt_path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.float().numpy() for k, v in sd.items()
          if hasattr(v, "numpy")}
    return convert_openai_clip_state_dict(sd)


def _iter_video_frames(frames_dir, k, suffix="jpg", limit=0):
    """Yield (video_id, frame paths): uniform-k sampling per video
    (reference ``extract_image_feats_from_frames.py:24-45``)."""
    import glob
    from care_tpu.data.samplers import get_uniform_items_from_k_snippets
    for vid_dir in sorted(glob.glob(os.path.join(frames_dir, "*"))):
        vid = os.path.basename(vid_dir)
        if limit and vid.startswith("video") and int(vid[5:]) >= limit:
            continue
        frames = sorted(glob.glob(os.path.join(vid_dir, f"*.{suffix}")))
        if not frames:
            continue
        if k:
            frames = get_uniform_items_from_k_snippets(frames, k)
        yield vid, frames


def cmd_image_feats(args):
    """Encode per-video frame dirs -> (k, d) HDF5 datasets, with either the
    CLIP visual tower (reference ``pretreatment/clip_feats.py``) or an
    ImageNet CNN (reference ``extract_image_feats_from_frames.py``)."""
    import h5py
    from PIL import Image
    from care_tpu import constants

    k = args.k if args.k is not None else constants.N_TOTAL_FRAMES
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)

    if args.model == "clip":
        assert args.clip_ckpt, "--clip_ckpt is required for --model clip"
        from care_tpu.pretreatment.clip import (CLIPVisionTransformer,
                                                preprocess_images,
                                                encode_images)
        vision, _, meta = _load_clip(args.clip_ckpt)
        model = CLIPVisionTransformer(patch_size=meta["patch"],
                                      width=meta["width"],
                                      layers=meta["v_layers"])

        def encode(frames):
            imgs = np.stack([
                np.asarray(Image.open(f).convert("RGB").resize((224, 224)))
                for f in frames])
            return encode_images(vision, preprocess_images(imgs), model)
    else:
        import jax
        import torch
        from care_tpu.models.cnn import (create_cnn, convert_cnn_state_dict,
                                         preprocess_cnn_images,
                                         encode_images as encode_cnn)
        model = create_cnn(args.model)
        if args.cnn_ckpt:
            sd = torch.load(args.cnn_ckpt, map_location="cpu")
            if hasattr(sd, "state_dict"):
                sd = sd.state_dict()
            sd = {kk: v.numpy() for kk, v in sd.items()
                  if hasattr(v, "numpy")}
            variables = convert_cnn_state_dict(sd, args.model)
        else:
            print("! no --cnn_ckpt given: random-init weights "
                  "(only useful for smoke tests)")
            dummy = np.zeros((1, 64, 64, 3), np.float32)
            variables = model.init(jax.random.PRNGKey(0), dummy,
                                   with_logits=args.logits)

        def encode(frames):
            imgs = np.stack([np.asarray(Image.open(f).convert("RGB"))
                             for f in frames])
            pre = preprocess_cnn_images(imgs, args.model)
            return encode_cnn(variables, pre, model,
                              with_logits=args.logits)

    with h5py.File(args.out, "w") as hf:
        for vid, frames in _iter_video_frames(args.frames_dir, k,
                                              args.frame_suffix, args.limit):
            hf.create_dataset(vid, data=encode(frames).astype(np.float32))
    print("- wrote", args.out)


def cmd_text_embs(args):
    """Encode every reference caption -> (n_captions, d) HDF5 per video,
    with CLIP's text tower (reference ``clip_text_embs.py``) or BERT with
    mean/max token pooling (reference ``bert_text_embs.py``)."""
    import h5py

    if args.arch == "bert":
        import torch
        from care_tpu.pretreatment.bert import (WordPieceTokenizer,
                                                convert_hf_bert_state_dict,
                                                extract_text_embs)
        assert args.bert_ckpt and args.vocab, \
            "--bert_ckpt and --vocab are required for --arch bert"
        sd = torch.load(args.bert_ckpt, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        sd = {k: v.float().numpy() for k, v in sd.items()
              if hasattr(v, "numpy")}
        variables, config = convert_hf_bert_state_dict(sd)
        tok = WordPieceTokenizer(args.vocab)
        with open(os.path.join(args.corpus_dir, "refs.pkl"), "rb") as f:
            refs = pickle.load(f)
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        extract_text_embs(variables, refs, tok, args.out, mode=args.mode,
                          config=config)
        print("- wrote", args.out)
        return

    from care_tpu.pretreatment.clip import CLIPTextTransformer, encode_texts
    from care_tpu.pretreatment.bpe import ClipTokenizer

    assert args.clip_ckpt, "--clip_ckpt is required for --arch clip"
    _, text_params, meta = _load_clip(args.clip_ckpt)
    model = CLIPTextTransformer(width=meta["t_width"],
                                layers=meta["t_layers"],
                                heads=meta["t_width"] // 64)
    tok = ClipTokenizer(args.bpe)
    with open(os.path.join(args.corpus_dir, "refs.pkl"), "rb") as f:
        refs = pickle.load(f)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with h5py.File(args.out, "w") as hf:
        for vid, entries in refs.items():
            ids = tok.tokenize([e["caption"] for e in entries],
                               truncate=True)
            embs = encode_texts(text_params, ids, model)
            hf.create_dataset(vid, data=embs.astype(np.float32))
    print("- wrote", args.out)


def cmd_retrieval(args):
    """Build the retrieval database (reference ``clip_retrieval.py``)."""
    import h5py
    from care_tpu.data.corpus import get_ids_set, load_info_corpus
    from care_tpu.data.samplers import get_uniform_ids_from_k_snippets
    from care_tpu.pretreatment.retrieval import build_retrieval_db

    corpus = load_info_corpus(os.path.join(args.corpus_dir,
                                           "info_corpus.pkl"))
    with open(os.path.join(args.corpus_dir, "refs.pkl"), "rb") as f:
        refs_data = pickle.load(f)
    split = corpus["info"]["split"]
    video_keys = ["video%d" % i for i in get_ids_set("all", dict(split))]
    text_keys = ["video%d" % i for i in get_ids_set("train", dict(split))]

    ids = get_uniform_ids_from_k_snippets(60, args.n_frames)
    image_embs, own_ranges, text_embs, refs = [], [], [], []
    with h5py.File(args.image_embs) as vdb, h5py.File(args.text_embs) as tdb:
        start = 0
        ranges = {}
        for key in text_keys:
            t = np.asarray(tdb[key])
            text_embs.append(t)
            ranges[key] = (start, start + t.shape[0])
            start += t.shape[0]
            refs += [e["caption"] for e in refs_data[key]]
        for key in video_keys:
            v = np.asarray(vdb[key])[ids].mean(0)
            image_embs.append(v)
            own_ranges.append(ranges.get(key, (-1, -1)))
    image_embs = np.stack(image_embs)
    text_embs = np.concatenate(text_embs, axis=0)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    build_retrieval_db(args.out, video_keys, image_embs, text_embs,
                       text_embs, topk=args.topk, own_ranges=own_ranges,
                       refs=refs, unique=True)
    print("- wrote", args.out)


def cmd_glove(args):
    """Extract per-vocab-word GloVe vectors -> .npy aligned with itow
    (reference ``utils_corpora.py:347-421``)."""
    from care_tpu.data.corpus import load_info_corpus
    corpus = load_info_corpus(os.path.join(args.corpus_dir,
                                           "info_corpus.pkl"))
    itow = corpus["info"]["itow"]
    vectors = {}
    with open(args.glove_txt, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip().split(" ")
            vectors[parts[0]] = np.asarray(parts[1:], np.float32)
    dim = len(next(iter(vectors.values())))
    table = np.zeros((len(itow), dim), np.float32)
    missing = 0
    for i in range(len(itow)):
        w = itow[i]
        if w in vectors:
            table[i] = vectors[w]
        else:
            missing += 1
    np.save(args.out, table)
    print(f"- wrote {args.out} ({missing} OOV rows left zero)")

    if args.categories_out:
        from care_tpu.pretreatment.corpora import prepare_category_embeddings
        cat = prepare_category_embeddings(args.glove_txt, dim)
        # store into the corpus so `use_category_embs` picks them up
        corpus["info"]["category_embeddings"] = cat
        from care_tpu.pretreatment.corpora import save_corpus
        save_corpus(os.path.join(args.corpus_dir, "info_corpus.pkl"), corpus)
        np.save(args.categories_out, cat)
        print(f"- wrote {args.categories_out} and updated info_corpus.pkl")


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("corpora")
    c.add_argument("--dataset", required=True,
                   choices=["MSVD", "MSRVTT", "VATEX"])
    c.add_argument("--annotation", required=True)
    c.add_argument("--val_annotation", default="")
    c.add_argument("--mapping", default="")
    c.add_argument("--frames_root", default="")
    c.add_argument("--out_dir", required=True)
    c.add_argument("--count_thr", type=int, default=2)
    c.add_argument("--no_attribute_first", action="store_true")
    c.set_defaults(func=cmd_corpora)

    f = sub.add_parser("frames")
    f.add_argument("--video_dir", required=True)
    f.add_argument("--out_dir", required=True)
    f.add_argument("--fps", type=int, default=None)
    f.set_defaults(func=cmd_frames)

    i = sub.add_parser("image_feats")
    i.add_argument("--frames_dir", required=True)
    i.add_argument("--model", default="clip",
                   choices=["clip", "resnet18", "resnet34", "resnet50",
                            "resnet101", "resnet152", "inceptionresnetv2"])
    i.add_argument("--clip_ckpt", default="",
                   help="OpenAI CLIP torch checkpoint (model=clip)")
    i.add_argument("--cnn_ckpt", default="",
                   help="torchvision/pretrainedmodels state_dict .pth "
                        "(CNN models)")
    i.add_argument("--logits", action="store_true",
                   help="keep the classifier head (semantic logits feats)")
    i.add_argument("--k", type=int, default=None,
                   help="uniformly sample k frames per video "
                        "(default n_total_frames; 0 = all frames)")
    i.add_argument("--frame_suffix", default="jpg")
    i.add_argument("--limit", type=int, default=0)
    i.add_argument("--out", required=True)
    i.set_defaults(func=cmd_image_feats)

    t = sub.add_parser("text_embs")
    t.add_argument("--corpus_dir", required=True)
    t.add_argument("--arch", default="clip", choices=["clip", "bert"])
    t.add_argument("--clip_ckpt", default="")
    t.add_argument("--bpe", default="",
                   help="CLIP BPE vocab (arch=clip)")
    t.add_argument("--bert_ckpt", default="",
                   help="HF BertModel torch state_dict .pth (arch=bert)")
    t.add_argument("--vocab", default="",
                   help="bert-base-uncased vocab.txt (arch=bert)")
    t.add_argument("--mode", default="mean", choices=["mean", "max"],
                   help="BERT token pooling (BERT.hdf5 vs BERT_max.hdf5)")
    t.add_argument("--out", required=True)
    t.set_defaults(func=cmd_text_embs)

    r = sub.add_parser("retrieval")
    r.add_argument("--corpus_dir", required=True)
    r.add_argument("--image_embs", required=True)
    r.add_argument("--text_embs", required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--topk", type=int, default=20)
    r.add_argument("--n_frames", type=int, default=28)
    r.set_defaults(func=cmd_retrieval)

    g = sub.add_parser("glove")
    g.add_argument("--glove_txt", required=True)
    g.add_argument("--corpus_dir", required=True)
    g.add_argument("--out", required=True)
    g.add_argument("--categories_out", default="",
                   help="also extract MSRVTT category embeddings and store "
                        "them in info_corpus.pkl")
    g.set_defaults(func=cmd_glove)

    args = p.parse_args()
    args.func(args)


if __name__ == "__main__":
    from care_tpu.utils.device import honor_jax_platforms
    honor_jax_platforms()
    main()
