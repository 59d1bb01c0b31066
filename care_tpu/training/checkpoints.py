"""Checkpointing: metric-monitored top-k checkpoints + last, carrying the
full ``opt`` dict.

Parity targets: reference ``train.py:18-27,76-96`` (``CheckpointCallback``
suppresses saving before ``start_saving_epoch``, monitors CIDEr by default,
keeps top-k + last, filenames embed metric values) and
``models/Wrapper.py:27`` (the opt dict is persisted inside the checkpoint so
reloading reconstructs the exact model).

Format: msgpack via ``flax.serialization`` for the variables pytree +
side-car JSON for opt/metadata — dependency-free and portable.
"""

import json
import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
from flax import serialization


def save_checkpoint(path: str, variables: Dict[str, Any], opt: dict,
                    metadata: Optional[dict] = None):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(variables))
    meta = {"opt": _jsonable(opt), "metadata": metadata or {}}
    with open(path + ".json", "w") as f:
        json.dump(meta, f)


def load_checkpoint(path: str, variables_template: Dict[str, Any] = None
                    ) -> Tuple[Dict[str, Any], dict, dict]:
    """Returns (variables, opt, metadata). With no template, returns the
    raw nested-dict state (arrays as numpy)."""
    with open(path, "rb") as f:
        data = f.read()
    if variables_template is not None:
        variables = serialization.from_bytes(variables_template, data)
    else:
        variables = serialization.msgpack_restore(data)
    meta_path = path + ".json"
    opt, metadata = {}, {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        opt = meta.get("opt", {})
        metadata = meta.get("metadata", {})
    return variables, opt, metadata


def _jsonable(d):
    def conv(v):
        if isinstance(v, (np.integer,)):
            return int(v)
        if isinstance(v, (np.floating,)):
            return float(v)
        if isinstance(v, np.ndarray):
            return v.tolist()
        if isinstance(v, dict):
            return {str(k): conv(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [conv(x) for x in v]
        if isinstance(v, (str, int, float, bool)) or v is None:
            return v
        return str(v)
    return conv(d)


class CheckpointManager:
    """Top-k + last checkpoint manager with a monitored metric."""

    def __init__(self, ckpt_dir: str, monitor_metric: str = "CIDEr",
                 monitor_mode: str = "max", save_topk: int = 1,
                 start_saving_epoch: int = 0):
        self.ckpt_dir = ckpt_dir
        self.monitor_metric = monitor_metric
        self.monitor_mode = monitor_mode
        self.save_topk = save_topk
        self.start_saving_epoch = start_saving_epoch
        self.topk: List[Tuple[float, str]] = []   # (metric, path)
        os.makedirs(ckpt_dir, exist_ok=True)

    def _better(self, a: float, b: float) -> bool:
        return a > b if self.monitor_mode == "max" else a < b

    def on_epoch_end(self, epoch: int, variables, opt, scores: dict):
        metric = float(scores.get(self.monitor_metric, float("-inf")))
        # always refresh `last`
        save_checkpoint(os.path.join(self.ckpt_dir, "last.ckpt"),
                        variables, opt, {"epoch": epoch, "scores":
                                         _jsonable(scores)})
        if epoch < self.start_saving_epoch:
            return

        name = f"epoch={epoch}_{self.monitor_metric}={metric:.4f}.ckpt"
        path = os.path.join(self.ckpt_dir, name)
        if len(self.topk) < self.save_topk:
            save_checkpoint(path, variables, opt,
                            {"epoch": epoch, "scores": _jsonable(scores)})
            self.topk.append((metric, path))
        else:
            worst = min(self.topk)[0] if self.monitor_mode == "max" \
                else max(self.topk)[0]
            if self._better(metric, worst):
                # drop the worst
                idx = min(range(len(self.topk)),
                          key=lambda i: self.topk[i][0]
                          if self.monitor_mode == "max"
                          else -self.topk[i][0])
                _, old_path = self.topk.pop(idx)
                for p in (old_path, old_path + ".json"):
                    if os.path.exists(p):
                        os.remove(p)
                save_checkpoint(path, variables, opt,
                                {"epoch": epoch,
                                 "scores": _jsonable(scores)})
                self.topk.append((metric, path))

        # refresh best symlink-equivalent
        if self.topk:
            best = max(self.topk)[1] if self.monitor_mode == "max" \
                else min(self.topk)[1]
            best_target = os.path.join(self.ckpt_dir, "best.ckpt")
            import shutil
            shutil.copyfile(best, best_target)
            if os.path.exists(best + ".json"):
                shutil.copyfile(best + ".json", best_target + ".json")

    @property
    def best_path(self) -> Optional[str]:
        p = os.path.join(self.ckpt_dir, "best.ckpt")
        return p if os.path.exists(p) else None
