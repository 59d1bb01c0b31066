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

    def state_dict(self) -> dict:
        return {"topk": [[m, p] for m, p in self.topk]}

    def load_state_dict(self, state: dict) -> None:
        self.topk = [(float(m), p) for m, p in state.get("topk", [])]


class TrainStateCheckpointer:
    """Sharded mid-run train-state save/restore (Orbax).

    Beyond the reference (which has no resume): persists the full training
    state — model variables, optax opt_state, rng stream, step/epoch
    counters, plateau-LR and top-k bookkeeping — WITHOUT host-gathering:
    each device writes its own shards, and restore places arrays back onto
    the same ``NamedSharding``s the live templates carry, so multi-chip
    runs resume without materialising the model on one host.
    """

    def __init__(self, state_dir: str, max_to_keep: int = 1):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self.mngr = ocp.CheckpointManager(
            os.path.abspath(state_dir),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

    def save(self, epoch: int, state_tree: Dict[str, Any], meta: dict):
        ocp = self._ocp
        self.mngr.save(epoch, args=ocp.args.Composite(
            state=ocp.args.StandardSave(state_tree),
            meta=ocp.args.JsonSave(_jsonable(meta))))
        self.mngr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        return self.mngr.latest_step()

    def restore_meta(self, epoch: int) -> dict:
        ocp = self._ocp
        out = self.mngr.restore(epoch, args=ocp.args.Composite(
            meta=ocp.args.JsonRestore()))
        return out["meta"]

    def restore_state(self, epoch: int,
                      template: Dict[str, Any]) -> Dict[str, Any]:
        """``template``: live pytree (same treedef); restored arrays adopt
        the template leaves' shardings."""
        ocp = self._ocp
        out = self.mngr.restore(epoch, args=ocp.args.Composite(
            state=ocp.args.StandardRestore(template)))
        return out["state"]

    def close(self):
        self.mngr.close()
