"""Device-resident per-video feature bank for training.

Video features are STATIC per video, yet the configured trainer was
re-shipping ~23 MB of them per batch over the tunnel's 22-42 MB/s H2D
link EVERY epoch — measured 55-60 samples/s against a 17.5k/s core-step
bound (round-4 verdict item 3; the reference never pays this cost since
its features sit in host RAM next to a local GPU,
``/root/reference/train.py:115-137``).

The bank uploads each modality's full per-video table ONCE —
``[n_videos, rows_m, dim_m]`` (frame streams keep all ``n_total_frames``
rows so every epoch's random frame sampling stays reachable) — and from
then on each batch ships only int32 indices (video row + sampled frame
ids, ~KB). One jitted gather assembles the batch's feats on device:

* frame streams (modality chars a/m/i/...): ``table[vid, frame_ids]`` —
  identical to the host-side ``feats[frame_ids]`` gather in
  ``datasets.py:_load_feats``;
* static streams (r = retrieved-caption embeddings, t = retrieved-caption
  token ids): ``table[vid]``.

Supported when ``load_feats_type == 0`` (the flagship/configured path:
frame ids drawn from ``n_total_frames`` ahead of the feature read) and
feats are not SwinBERTDense (its ``load_all`` stream bypasses frame
sampling). Unsupported configurations return ``None`` from
:func:`build_feature_bank` and the trainer keeps the per-batch shipping
path. Tables default to f32 (bit-identical training); set
``opt["feature_cache_dtype"] = "bfloat16"`` to halve HBM + upload at the
cost of bf16-rounded features.
"""

from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp


class DeviceFeatureBank:
    def __init__(self, tables: List[Any], kinds: List[str],
                 vid_to_row: Dict[str, int], cast_f32: bool):
        self.tables = tables          # device arrays, one per modality
        self.kinds = kinds            # 'frame' | 'static' per modality
        self.vid_to_row = vid_to_row
        n_frame = sum(k == "frame" for k in kinds)

        def gather(tables, vidx, fidx):
            out = []
            for t, kind in zip(tables, kinds):
                if kind == "frame":
                    g = t[vidx[:, None], fidx]
                else:
                    g = t[vidx]
                if cast_f32 and jnp.issubdtype(g.dtype, jnp.floating):
                    g = g.astype(jnp.float32)
                out.append(g)
            return out

        self._gather = jax.jit(gather)
        self._needs_frames = n_frame > 0

    def covers(self, video_ids) -> bool:
        return all(v in self.vid_to_row for v in video_ids)

    def lookup(self, video_ids, frame_ids=None) -> List[Any]:
        """video_ids: list of vid strings; frame_ids: [B][n_frames] (only
        consulted when a frame stream exists). Returns device feats in
        modality order."""
        vidx = jnp.asarray([self.vid_to_row[v] for v in video_ids],
                           jnp.int32)
        if self._needs_frames:
            assert frame_ids is not None, "frame stream without frame_ids"
            fidx = jnp.asarray(np.asarray(frame_ids, np.int32))
        else:
            fidx = jnp.zeros((len(video_ids), 1), jnp.int32)
        return list(self._gather(self.tables, vidx, fidx))

    def nbytes(self) -> int:
        return int(sum(t.size * t.dtype.itemsize for t in self.tables))

    def describe(self) -> str:
        shapes = ", ".join(f"{k}:{tuple(t.shape)}:{t.dtype}"
                           for t, k in zip(self.tables, self.kinds))
        return (f"{len(self.vid_to_row)} videos, "
                f"{self.nbytes() / 1e6:.1f} MB resident [{shapes}]")


def build_feature_bank(dataset, opt: dict) -> Optional[DeviceFeatureBank]:
    """Build a bank from a VideoOnlyDataset/JointDataset; None when the
    configuration is unsupported or the tables are inconsistent."""
    if opt.get("load_feats_type", 0) != 0:
        return None
    if opt.get("feats") == "SwinBERTDense":
        return None
    if not hasattr(dataset, "databases") or not hasattr(dataset, "ids_set"):
        return None

    dtype = opt.get("feature_cache_dtype")
    store = jnp.bfloat16 if dtype in ("bfloat16", "bf16") else None

    try:
        vids = ["video%d" % i for i in dataset.ids_set]
        vid_to_row = {v: i for i, v in enumerate(vids)}
        is_vatex_remap = (opt.get("feats", "") == "I3D"
                          and opt.get("dataset") == "VATEX")

        tables, kinds = [], []
        for item in dataset.databases:
            modality = item[0]
            rows_host = []
            for vid in vids:
                inner = dataset.vid2id[vid] if is_vatex_remap else vid
                if modality == "r":
                    rows_host.append(dataset.load_r_feats(item, inner))
                elif modality == "t":
                    rows_host.append(
                        dataset.load_t_feats(item, inner).astype(np.int32))
                else:
                    rows_host.append(dataset._load_feats(
                        item[1:], inner, load_all=True))
            shape0 = rows_host[0].shape
            for k, r in enumerate(rows_host):
                if r.shape != shape0:
                    # missing-video zero-fill comes back at [n_frames, dim]
                    # instead of the full table shape — normalise to zeros
                    if not np.any(r):
                        rows_host[k] = np.zeros(shape0, r.dtype)
                    else:
                        return None  # genuinely ragged tables: unsupported
            table = np.stack(rows_host)
            if store is not None and table.dtype == np.float32:
                table = table.astype(store)
            tables.append(jax.device_put(table))
            kinds.append("static" if modality in ("r", "t") else "frame")
        return DeviceFeatureBank(tables, kinds, vid_to_row,
                                 cast_f32=store is not None)
    except Exception as e:  # unsupported layout: keep the shipping path
        print(f"- device feature cache disabled: {type(e).__name__}: {e}")
        return None
