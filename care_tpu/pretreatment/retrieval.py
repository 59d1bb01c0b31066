"""Cross-modal retrieval database construction + self-evaluation.

Parity target: reference ``pretreatment/clip_retrieval.py`` — video
embedding = mean of n uniformly sampled frame embeddings, L2-normalise both
sides, cosine similarities ``image @ text.T``, rank, skip the query video's
own caption range [start, end), deduplicate identical captions, keep top-k;
store per-video caption embeddings under ``<vid>`` and flat caption indices
under ``<vid>_i``. ``--eval`` mode reports R@{1,5,10}, mAP, median/mean rank.

TPU-first: the similarity matrix, ranking and the eval metrics are one
batched XLA program (sharded matmul + top-k) instead of a per-video python
loop; only the dedup/own-video filter walks the (top few hundred)
candidates on host.
"""

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from care_tpu.data.samplers import get_uniform_ids_from_k_snippets


def video_embeddings_from_frames(frame_embs: np.ndarray, n_frames: int):
    """(n_total_frames, d) -> (d,): mean of uniformly sampled frames."""
    ids = get_uniform_ids_from_k_snippets(frame_embs.shape[0], n_frames)
    return frame_embs[ids].mean(axis=0)


def l2_normalize(x, axis=-1, eps=1e-12):
    n = np.linalg.norm(x, axis=axis, keepdims=True)
    return x / np.maximum(n, eps)


import functools


@functools.partial(jax.jit, static_argnums=(2,))
def _sims_topk(image_features, text_features, k):
    sims = jnp.einsum("id,td->it", image_features, text_features,
                      preferred_element_type=jnp.float32)
    return jax.lax.top_k(sims, k)


def retrieve_topk(image_features: np.ndarray, text_features: np.ndarray,
                  topk: int, own_ranges: Optional[List[Tuple[int, int]]] = None,
                  refs: Optional[List[str]] = None, unique: bool = False,
                  candidate_factor: int = 20) -> List[List[int]]:
    """For each video return the top-k caption indices after own-video and
    duplicate filtering. Candidates are fetched on-device (top
    ``topk*candidate_factor``) and filtered on host."""
    n_text = text_features.shape[0]
    k = min(topk * candidate_factor + 64, n_text)
    img = jnp.asarray(l2_normalize(image_features), jnp.float32)
    txt = jnp.asarray(l2_normalize(text_features), jnp.float32)
    _, indices = _sims_topk(img, txt, k)
    indices = np.asarray(indices)

    results = []
    for i in range(indices.shape[0]):
        start, end = own_ranges[i] if own_ranges is not None else (-1, -1)
        unique_caps = set()
        relevant = []
        for ind in indices[i]:
            ind = int(ind)
            if start <= ind < end:
                continue
            if unique:
                cap = refs[ind]
                if cap in unique_caps:
                    continue
                unique_caps.add(cap)
            relevant.append(ind)
            if len(relevant) == topk:
                break
        results.append(relevant)
    return results


def build_retrieval_db(out_path: str, video_keys: Sequence[str],
                       image_features: np.ndarray,
                       text_features: np.ndarray,
                       store_embs: np.ndarray,
                       topk: int,
                       own_ranges=None, refs=None, unique: bool = True):
    """Write ``retrieval/*.hdf5``: per-video top-k caption embeddings under
    ``<vid>`` + flat caption indices under ``<vid>_i``."""
    import h5py
    ids = retrieve_topk(image_features, text_features, topk,
                        own_ranges=own_ranges, refs=refs, unique=unique)
    with h5py.File(out_path, "w") as hf:
        for vid, relevant in zip(video_keys, ids):
            hf.create_dataset(vid, data=store_embs[relevant])
            hf.create_dataset(vid + "_i",
                              data=np.asarray(relevant, np.int64))
    return ids


def evaluate_retrieval(image_features: np.ndarray, text_features: np.ndarray,
                       own_ranges: List[Tuple[int, int]],
                       k_list=(1, 5, 10)) -> Dict[str, float]:
    """R@K / mAP / median / mean rank of the retrieval itself
    (reference ``clip_retrieval.py:192-234``), fully vectorised."""
    img = jnp.asarray(l2_normalize(image_features), jnp.float32)
    txt = jnp.asarray(l2_normalize(text_features), jnp.float32)
    sims = jnp.einsum("id,td->it", img, txt)
    order = jnp.argsort(-sims, axis=1)
    rank = jnp.argsort(order, axis=1)            # rank of each caption
    rank = np.asarray(rank)

    all_rank, all_precision = [], []
    recall = {k: [] for k in k_list}
    for i, (start, end) in enumerate(own_ranges):
        gt_rank = rank[i, start:end].astype(np.float64)
        all_rank.append(gt_rank.min() + 1)
        for k in k_list:
            recall[k].append(1.0 if (gt_rank < k).sum() > 0 else 0.0)
        sorted_hit = np.sort(gt_rank)
        ids = np.arange(len(sorted_hit))
        all_precision.append(((ids + 1) / (sorted_hit + 1)).mean())

    out = {f"R@{k}": float(np.mean(recall[k]) * 100) for k in k_list}
    out["mAP"] = float(np.mean(all_precision) * 100)
    out["MedianRank"] = float(np.median(all_rank))
    out["MeanRank"] = float(np.mean(all_rank))
    return out
