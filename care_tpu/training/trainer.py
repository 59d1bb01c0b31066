"""Training runtime: the Lightning replacement.

Parity targets: reference ``train.py:30-145`` + ``models/Wrapper.py`` —
jitted train step over epochs, per-epoch caption generation + COCO scoring
on the validation set, CIDEr-monitored top-k checkpoints with
``start_saving_epoch``, best-checkpoint reload for testing, CSV/TensorBoard
logging, the scheduled-sampling probability ramp, the epoch-indexed
``training_scales`` re-weighting, and the CARE dual-optimizer switch at
``lowlr_start_epoch``.

TPU-first: one jit-compiled ``train_step`` (forward + multi-task loss +
grads + Adam update) over static shapes; optional data-parallel sharding of
the batch over a mesh (``care_tpu.parallel``); all metric recorders come
back as scalars accumulated host-side.
"""

import os
import time
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import traverse_util

from care_tpu import constants
from care_tpu.models import build_captioner
from care_tpu.models.framework import Captioner
from care_tpu.decoding import get_translator
from care_tpu.training.losses import Criterion, ATTR_FLAG_TO_KEY
from care_tpu.training import optim as optim_lib
from care_tpu.training.checkpoints import CheckpointManager, save_checkpoint
from care_tpu.metrics import COCOScorer
from care_tpu.utils.logger import (AverageMeter, MetricTracker,
                                   analyze_length_novel_unique,
                                   save_dict_to_csv, to_sentence)

ARRAY_BATCH_KEYS_SKIP = ("video_ids", "caption_ids", "frame_ids")


def device_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Keep only array-valued entries (jit-compatible)."""
    out = {}
    for k, v in batch.items():
        if k in ARRAY_BATCH_KEYS_SKIP:
            continue
        if isinstance(v, np.ndarray):
            out[k] = jnp.asarray(v)
        elif isinstance(v, list) and v and isinstance(v[0], np.ndarray):
            out[k] = [jnp.asarray(x) for x in v]
    return out


def schedule_sampling_prob(opt: dict, epoch: int) -> float:
    """reference ``Framework.py:221-229``."""
    start = opt.get("scheduled_sampling_start", -1)
    if start < 0 or epoch <= start:
        return 0.0
    frac = (epoch - start) // opt.get("scheduled_sampling_increase_every", 5)
    return min(opt.get("scheduled_sampling_increase_prob", 0.05) * frac,
               opt.get("scheduled_sampling_max_prob", 0.25))


class Trainer:
    def __init__(self, opt: dict, train_loader=None, val_loader=None,
                 test_loader=None, references=None, vocab=None,
                 log_dir: Optional[str] = None, mesh=None):
        self.opt = opt
        self.model = build_captioner(opt)
        self.translator = get_translator(opt)
        self.criterion = Criterion(opt, override_opt={"calculate_mAP": False})
        self.eval_criterion = Criterion(opt, skip_crit_list=["lang"],
                                        override_opt={"calculate_mAP": True},
                                        with_metrics=True)
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.test_loader = test_loader
        self.references = references
        self.vocab = vocab
        self.mesh = mesh

        self.ckpt_manager = CheckpointManager(
            opt.get("checkpoint_path", "./exps/run"),
            monitor_metric=opt.get("monitor_metric", "CIDEr"),
            monitor_mode=opt.get("monitor_mode", "max"),
            save_topk=opt.get("save_topk_models", 1),
            start_saving_epoch=opt.get("start_saving_epoch", 0))

        self.tb = None
        if log_dir:
            try:
                from tensorboardX import SummaryWriter
                self.tb = SummaryWriter(log_dir)
            except Exception:
                self.tb = None

        self.variables = None
        self.opt_state = None
        self.tx = None
        self.global_step = 0
        self.best_scores: Dict[str, float] = {}
        self.history: list = []   # per-epoch log dicts (loss, time, scores)
        self._train_step_fn = None
        self._eval_metrics_fn = None
        self._needs_aux = any(
            f != "V" for f in (opt.get("attribute_prediction_flags") or "V")
        ) and "attribute" in opt["crits"]

    # ------------------------------------------------------------------
    def init_model(self, example_batch: Dict[str, Any], seed: int = None):
        seed = self.opt.get("seed", 0) if seed is None else seed
        rng = jax.random.PRNGKey(seed)
        batch = device_batch(example_batch)
        self.variables = self.model.init(
            {"params": rng, "dropout": rng, "sampling": rng}, batch,
            deterministic=False)
        if self.opt.get("backbone_weights"):
            from care_tpu.models.backbone import maybe_load_backbone_weights
            self.variables = maybe_load_backbone_weights(self.variables,
                                                         self.opt)
        if self.mesh is not None:
            from care_tpu.parallel import shard_params
            self.variables = shard_params(self.variables, self.mesh)
        return self.variables

    def _device_batch(self, batch):
        # multi-host loaders (HostShardedBatches) already yield global,
        # mesh-placed jax.Arrays — pass them through untouched
        leaves = jax.tree.leaves(batch)
        if leaves and all(
                getattr(getattr(l, "sharding", None), "mesh", None)
                is not None for l in leaves):
            return batch
        bank = getattr(self, "_feature_bank", None)
        served = self._bank_serve(bank, batch)
        if served is not None:
            return served
        if bank is not None and "feats" not in batch:
            # skip_feats stripped the host feats but the bank cannot serve
            # this batch: fail loudly here instead of a KeyError deep in
            # model.apply (build-time coverage checks make this unreachable
            # for consistent datasets)
            missing = [v for v in batch.get("video_ids", [])
                       if v not in bank.vid_to_row]
            raise RuntimeError(
                "device feature bank cannot serve batch (uncovered "
                f"video_ids {missing[:5]}...) and host feats were "
                "skipped — set opt['device_feature_cache']=False")
        b = device_batch(batch)
        if self.mesh is not None:
            from care_tpu.parallel import shard_batch
            b = shard_batch(b, self.mesh)
        return b

    @staticmethod
    def _bank_serve(bank, batch):
        """Assemble a device batch from a feature bank when it covers the
        batch (feats gathered ON DEVICE from the resident tables; only
        indices + text arrays cross the tunnel); None when the bank
        cannot serve it."""
        if bank is None or "video_ids" not in batch \
                or not bank.covers(batch["video_ids"]):
            return None
        b = device_batch({k: v for k, v in batch.items() if k != "feats"})
        b["feats"] = bank.lookup(batch["video_ids"],
                                 batch.get("frame_ids"))
        return b

    def _maybe_val_bank(self, loader):
        """Feature bank for an eval loader's dataset (built lazily, cached
        per dataset id).  Unlike the train bank this never sets
        ``skip_feats`` — host feats remain as the trivial fallback."""
        if not self.opt.get("device_feature_cache", True) \
                or self.mesh is not None:
            return None
        ds = getattr(loader, "dataset", None)
        if ds is None:
            return None
        cache = getattr(self, "_val_banks", None)
        if cache is None:
            cache = self._val_banks = {}
        key = id(ds)
        if key not in cache:
            from care_tpu.data.feature_bank import build_feature_bank
            cache[key] = (build_feature_bank(ds, self.opt), ds)
            if cache[key][0] is not None:
                print("- validation feature cache: "
                      f"{cache[key][0].describe()}")
        return cache[key][0]

    def _maybe_build_feature_bank(self):
        """Device-resident feature cache (data/feature_bank.py): features
        are static per video, so ship each modality's full table ONCE and
        gather per batch on device instead of re-shipping ~MBs/batch over
        the tunnel every epoch (round-4 verdict item 3).  Single-process
        only (multi-host input is already host-sliced + mesh-placed)."""
        if getattr(self, "_feature_bank", None) is not None:
            return
        opt = self.opt
        if not opt.get("device_feature_cache", True) \
                or self.mesh is not None \
                or self.train_loader is None \
                or not hasattr(self.train_loader, "dataset"):
            return
        from care_tpu.data.feature_bank import build_feature_bank
        dataset = self.train_loader.dataset
        bank = build_feature_bank(dataset, opt)
        if bank is None:
            return
        # coverage sanity on a real sample before committing to the bank:
        # a vid-naming mismatch must fall back, not crash mid-epoch.  The
        # probe must not advance the dataset's sampling RNGs (resume and
        # loss trajectories are exact-reproducibility invariants).
        rng_states = []
        for attr in ("rng", "random"):
            r = getattr(dataset, attr, None)
            if r is not None:
                rng_states.append((r, r.get_state()))
        probe = dataset[0]
        for r, st in rng_states:
            r.set_state(st)
        if probe.get("video_ids") not in bank.vid_to_row:
            return
        # full-coverage check where the sample list is enumerable (the
        # JointDataset infoset): skip_feats must never strip feats from a
        # batch the bank cannot serve
        infoset = getattr(dataset, "infoset", None)
        if infoset is not None:
            vids = {e.get("vid") for e in infoset}
            if not all(v in bank.vid_to_row for v in vids):
                return
        self._feature_bank = bank
        dataset.skip_feats = True
        print(f"- device feature cache: {bank.describe()}")

    def _build_tx(self, steps_per_epoch: int):
        opt = self.opt
        params = self.variables["params"]
        sched = optim_lib.make_lr_schedule(opt, steps_per_epoch)
        self.tx1 = optim_lib.make_adam(opt, sched, params)
        self.tx = self.tx1
        self.opt_state = self.tx1.init(params)
        self.lr_sched = sched
        self.steps_per_epoch = steps_per_epoch
        self._is_multi_optimizer = (opt.get("wrapper") ==
                                    "MultipleOptimizerModel")
        self._switched = False

    def _maybe_switch_optimizer(self, epoch: int):
        """CARE recipe: a fresh low-LR-on-(encoder,detector) Adam takes over
        at ``lowlr_start_epoch`` (reference ``Wrapper.py:529-537``)."""
        if (self._is_multi_optimizer and not self._switched
                and epoch >= self.opt.get("lowlr_start_epoch", 10)):
            params = self.variables["params"]
            tx2 = optim_lib.make_dual_adam(
                self.opt, params, self.steps_per_epoch,
                offset_steps=self.global_step)
            self.tx = tx2
            self.opt_state = tx2.init(params)
            self._train_step_fn = None  # re-jit with the new tx
            self._switched = True
            self._switch_offset = self.global_step  # for resume replay

    # ------------------------------------------------------------------
    def _make_train_step(self):
        model = self.model
        criterion = self.criterion
        tx = self.tx
        opt = self.opt
        has_batch_stats = "batch_stats" in (self.variables or {})
        collect_aux = self._needs_aux
        # fused-xent training (ops/fused_xent.py): skip the model's vocab
        # projection and stream the criterion's statistics chunkwise from
        # (hidden_states, head kernel) — the [B, L, V] logits and their
        # gradient never materialise.  Static eligibility: single hidden
        # stream through a plain NaiveHead, no pointer copy-probs, no
        # visual-word multi-pass, transformer decoder, lang crit present.
        # under a model-parallel mesh the vocab kernel is TP-sharded: the
        # chunked scan would force per-chunk W gathers, while the dense
        # path's softmax over a sharded vocab axis is the GSPMD pattern
        # XLA reduces natively — keep dense there
        tp_mesh = False
        if self.mesh is not None:
            from care_tpu.parallel import MODEL_AXIS
            tp_mesh = self.mesh.shape.get(MODEL_AXIS, 1) > 1
        fx_opt = opt.get("fused_xent", "auto")
        if fx_opt == "auto":
            # measured A/B (bench detail.train_step): the dense CE step is
            # ~5-15% FASTER than the chunked recompute at the flagship
            # shape — the fusion's win is the [B, L, V] logits + grad
            # activations, which only matter once they are a real slice of
            # HBM.  Fuse when that term clears the threshold; keep the
            # faster dense step otherwise.  True/False still force.
            logits_mb = (opt.get("batch_size", 64)
                         * (opt.get("max_len", 30) + 2)
                         * opt.get("vocab_size", 11000) * 4 * 2) / 2**20
            fx_opt = logits_mb >= float(
                opt.get("fused_xent_auto_threshold_mb", 512))
        fused_xent = (bool(fx_opt)
                      and not tp_mesh
                      and "lang" in opt.get("crits", [])
                      and opt.get("cls_head") == "NaiveHead"
                      and not opt.get("pointer")
                      and not opt.get("visual_word_generation", False)
                      and "rnn" not in opt.get("decoder", "").lower())
        self._fused_xent = fused_xent

        def train_step(params, extra_vars, opt_state, batch, rng, ss_prob):
            dropout_rng, sampling_rng = jax.random.split(rng)

            def loss_fn(p):
                variables = {"params": p, **extra_vars}
                rngs = {"dropout": dropout_rng, "sampling": sampling_rng}
                if has_batch_stats:
                    outputs, mutated = model.apply(
                        variables, batch, deterministic=False,
                        schedule_sampling_prob=ss_prob,
                        collect_aux=collect_aux, rngs=rngs,
                        mutable=["batch_stats"],
                        compute_logits=not fused_xent)
                else:
                    outputs = model.apply(
                        variables, batch, deterministic=False,
                        schedule_sampling_prob=ss_prob,
                        collect_aux=collect_aux, rngs=rngs,
                        compute_logits=not fused_xent)
                    mutated = {}

                def project_fn(feats, flag):
                    return model.apply(variables, feats, flag,
                                       method=Captioner.project_attribute)

                results = {**outputs, **batch}
                if fused_xent and "logits" not in outputs:
                    results["cls_head_kernel"] = \
                        p["cls_head"]["tgt_word_prj"]["kernel"]
                total, losses, metrics = criterion(results, project_fn)
                return total, (losses, metrics, mutated)

            (loss, (losses, metrics, mutated)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt_state = tx.update(grads, opt_state, params)
            new_params = jax.tree.map(lambda p, u: p + u, params, updates)
            return new_params, mutated, new_opt_state, loss, losses, metrics

        # donate params + opt_state: the updated copies reuse their buffers
        return jax.jit(train_step, donate_argnums=(0, 2))

    # ------------------------------------------------------------------
    @staticmethod
    def _drain_step_stats(step_stats):
        """Fetch an epoch's worth of per-step device scalars in ONE stacked
        device->host transfer; yields (loss, losses_dict, metrics_dict) as
        python floats per step.  Per-scalar fetches would each pay the
        runtime's fixed transfer cost."""
        if not step_stats:
            return
        _, losses0, metrics0 = step_stats[0]
        lk, mk = sorted(losses0), sorted(metrics0)
        rows = [[loss] + [losses[k] for k in lk] + [metrics[k] for k in mk]
                for loss, losses, metrics in step_stats]
        mat = np.asarray(jnp.asarray(rows))          # one program, one fetch
        for row in mat:
            yield (float(row[0]),
                   {k: float(v) for k, v in zip(lk, row[1:1 + len(lk)])},
                   {k: float(v) for k, v in zip(mk, row[1 + len(lk):])})

    # ------------------------------------------------------------------
    def fit(self, epochs: Optional[int] = None):
        opt = self.opt
        epochs = epochs if epochs is not None else opt["epochs"]
        assert self.train_loader is not None

        # pod-scale input: each host feeds its slice of the global batch
        # (no-op single-process; see parallel/input.py)
        if self.mesh is not None and jax.process_count() > 1:
            from care_tpu.parallel import HostShardedBatches
            if not isinstance(self.train_loader, HostShardedBatches):
                self.train_loader = HostShardedBatches(self.train_loader,
                                                       self.mesh)

        if self.variables is None:
            first = next(iter(self.train_loader))
            self.init_model(first)
        if self.tx is None:
            self._build_tx(max(len(self.train_loader), 1))
        self._maybe_build_feature_bank()

        training_scales = opt.get("training_scales", {}) or {}
        rng = jax.random.PRNGKey(opt.get("seed", 0) + 1)

        start_epoch = 0
        if opt.get("resume"):
            rng, start_epoch = self._try_resume(training_scales, rng)

        for epoch in range(start_epoch, epochs):
            self._maybe_switch_optimizer(epoch)
            if epoch in training_scales:
                self.criterion.set_scales(training_scales[epoch])
                self._train_step_fn = None

            if self._train_step_fn is None:
                self._train_step_fn = self._make_train_step()

            ss_prob = schedule_sampling_prob(opt, epoch)
            self.train_loader.set_epoch(epoch)
            loss_meter = AverageMeter()
            per_loss = MetricTracker()
            metric_tracker = MetricTracker()
            t0 = time.time()
            from care_tpu.data.loader import prefetch
            batches = prefetch(self.train_loader,
                               n=opt.get("prefetch_batches", 2),
                               transform=self._device_batch)
            profile_dir = opt.get("profile_dir", "")
            step_in_epoch = 0
            # per-step stats stay ON DEVICE during the epoch and drain in
            # one stacked fetch at epoch end: a per-step float(loss) would
            # pay the runtime's fixed host-fetch cost (~26-85 ms on the
            # axon runtime) every step, serialising the whole epoch behind
            # dispatch floors instead of chaining device steps back-to-back
            step_stats = []
            for b in batches:
                # capture a profiler trace over steps 5-10 of epoch 0
                # (reference has only wall-clock latency logging; see
                # utils/profiling.py for the latency.txt protocol)
                if profile_dir and epoch == 0 and step_in_epoch == 5:
                    jax.profiler.start_trace(profile_dir)
                if profile_dir and epoch == 0 and step_in_epoch == 10:
                    jax.profiler.stop_trace()
                step_in_epoch += 1
                rng, step_rng = jax.random.split(rng)
                params = self.variables["params"]
                extra = {k: v for k, v in self.variables.items()
                         if k != "params"}
                (params, mutated, self.opt_state, loss, losses,
                 metrics) = self._train_step_fn(
                    params, extra, self.opt_state, b, step_rng, ss_prob)
                self.variables = {"params": params, **extra, **mutated}
                step_stats.append((loss, losses, metrics))
                self.global_step += 1

            for lv, ld, md in self._drain_step_stats(step_stats):
                loss_meter.update(lv)
                per_loss.update(ld)
                per_loss.update({"_n": 1.0})
                metric_tracker.update(md)

            if profile_dir and epoch == 0 and 5 < step_in_epoch <= 10:
                try:
                    jax.profiler.stop_trace()
                except Exception:
                    pass

            epoch_time = time.time() - t0
            log = {"train_loss": loss_meter.avg, "epoch_time": epoch_time,
                   "schedule_sampling_prob": ss_prob}
            n_steps = max(per_loss.sums.get("_n", 1.0), 1.0)
            for k, v in per_loss.sums.items():
                if k != "_n":
                    log[k] = v / n_steps
            # criterion recorders (reference training_epoch_end info):
            # word accuracy + perplexity from the lang crit
            if metric_tracker.sums.get("word_acc_den0"):
                log["Word Acc0"] = metric_tracker.ratio("word_acc_num0",
                                                        "word_acc_den0")
            if metric_tracker.sums.get("xent_count"):
                import math
                log["Perplexity"] = math.exp(
                    metric_tracker.ratio("xent_sum", "xent_count"))
            if self.tb:
                for k, v in log.items():
                    self.tb.add_scalar(k, v, epoch)

            # validation: generation + COCO scoring
            scores = {}
            if self.val_loader is not None and (
                    (epoch + 1) % opt.get("check_val_every_n_epoch", 1) == 0):
                scores = self.validate(epoch)

            # host-side ReduceLROnPlateau (reference Wrapper.py:362-376):
            # when the monitored metric stalls, rebuild the optimizer chain
            # with a scaled constant LR (Adam moments are preserved, the
            # opt_state pytree structure is unchanged)
            if opt.get("lr_scheduler_type") == "plateau" and scores:
                if not hasattr(self, "_plateau"):
                    from care_tpu.training.optim import PlateauController
                    self._plateau = PlateauController(opt)
                prev = self._plateau.scale
                self._plateau.update(scores)
                if self._plateau.scale != prev:
                    lr = self._plateau.current_lr(opt["learning_rate"])
                    self.tx = optim_lib.make_adam(
                        opt, lambda step: lr, self.variables["params"])
                    self._train_step_fn = None

            self.ckpt_manager.on_epoch_end(epoch, self.variables, opt, scores)
            if opt.get("resume"):
                self._save_train_state(epoch, rng)
            self.history.append({"epoch": epoch, **log,
                                 "n_steps": step_in_epoch,
                                 "scores": dict(scores)})
            print(f"- epoch {epoch}: loss={loss_meter.avg:.4f} "
                  f"{self._fmt_scores(scores)} ({epoch_time:.1f}s)")
        return self.best_scores

    # ------------------------------------------------------------------
    # mid-run resume (sharded train state; beyond the reference, which
    # restarts from scratch — see checkpoints.TrainStateCheckpointer)
    # ------------------------------------------------------------------
    def _train_state_ckpt(self):
        if getattr(self, "_ts_ckpt", None) is None:
            from care_tpu.training.checkpoints import TrainStateCheckpointer
            state_dir = self.opt.get("train_state_dir") or os.path.join(
                self.opt.get("checkpoint_path", "./exps/run"), "train_state")
            self._ts_ckpt = TrainStateCheckpointer(state_dir)
        return self._ts_ckpt

    def _save_train_state(self, epoch: int, rng):
        meta = {"epoch": epoch, "global_step": self.global_step,
                "switched": self._switched,
                "switch_offset": getattr(self, "_switch_offset", 0),
                "ckpt_manager": self.ckpt_manager.state_dict()}
        if hasattr(self, "_plateau"):
            meta["plateau"] = {"best": self._plateau.best,
                               "bad_epochs": self._plateau.bad_epochs,
                               "scale": self._plateau.scale}
        self._train_state_ckpt().save(
            epoch, {"variables": self.variables,
                    "opt_state": self.opt_state, "rng": rng}, meta)

    def _try_resume(self, training_scales, rng):
        """Restore the latest epoch's train state (if any); returns the
        (possibly restored) rng and the epoch to continue from."""
        ts = self._train_state_ckpt()
        latest = ts.latest_epoch()
        if latest is None:
            return rng, 0
        opt = self.opt
        meta = ts.restore_meta(latest)
        self.global_step = int(meta["global_step"])

        # replay the optimizer phase so opt_state templates line up
        for e in range(latest + 1):
            if e in training_scales:
                self.criterion.set_scales(training_scales[e])
        if meta.get("switched"):
            params = self.variables["params"]
            self._switch_offset = int(meta.get("switch_offset", 0))
            self.tx = optim_lib.make_dual_adam(
                opt, params, self.steps_per_epoch,
                offset_steps=self._switch_offset)
            self.opt_state = self.tx.init(params)
            self._switched = True
        if meta.get("plateau"):
            from care_tpu.training.optim import PlateauController
            self._plateau = PlateauController(opt)
            self._plateau.best = meta["plateau"]["best"]
            self._plateau.bad_epochs = int(meta["plateau"]["bad_epochs"])
            self._plateau.scale = float(meta["plateau"]["scale"])
            if self._plateau.scale != 1.0:
                lr = self._plateau.current_lr(opt["learning_rate"])
                self.tx = optim_lib.make_adam(opt, lambda step: lr,
                                              self.variables["params"])
                self.opt_state = self.tx.init(self.variables["params"])
        self.ckpt_manager.load_state_dict(meta.get("ckpt_manager", {}))

        template = {"variables": self.variables,
                    "opt_state": self.opt_state, "rng": rng}
        if self.mesh is not None:
            # leaves without a mesh sharding (optax counts, rng) must come
            # back replicated on the mesh, not committed to one device —
            # otherwise the next jitted step sees mixed committed devices
            from jax.sharding import NamedSharding, PartitionSpec

            def _mesh_place(x):
                if getattr(getattr(x, "sharding", None), "mesh", None) \
                        is not None:
                    return x
                return jax.device_put(
                    x, NamedSharding(self.mesh, PartitionSpec()))
            template = jax.tree.map(_mesh_place, template)
        restored = ts.restore_state(latest, template)
        self.variables = restored["variables"]
        self.opt_state = restored["opt_state"]
        rng = restored["rng"]
        self._train_step_fn = None
        print(f"- resumed train state from epoch {latest}")
        return rng, latest + 1

    def _fmt_scores(self, scores):
        keys = ["CIDEr", "Bleu_4", "METEOR", "ROUGE_L", "Sum"]
        return " ".join(f"{k}={scores[k]:.4f}" for k in keys if k in scores)

    # ------------------------------------------------------------------
    def _get_teacher(self):
        """Attach the AR teacher for NAR rescoring (reference
        ``Wrapper.py:287-294``)."""
        if (self.opt.get("decoding_type") != "NARFormer"
                or not self.opt.get("teacher_path")):
            return None, None
        if not hasattr(self, "_teacher"):
            from care_tpu.models.loading import load_model, get_vocab_mapping
            models, t_opt = load_model(self.opt["teacher_path"])
            vm = None
            try:
                vm = get_vocab_mapping(self.opt, t_opt)
            except Exception:
                vm = None
            self._teacher = (models[0], vm)
        return self._teacher

    def _teacher_kwargs(self):
        teacher, vocab_mapping = self._get_teacher()
        if teacher is None:
            return {}
        return {"teacher": teacher, "vocab_mapping": vocab_mapping}

    def translate_step(self, batch) -> Dict[str, list]:
        """Generate captions for a batch; returns dict[vid] -> preds."""
        b = device_batch(batch)
        hyps, scores = self.translator.translate_batch(
            [(self.model, self.variables)], b, **self._teacher_kwargs())
        return self._collect_preds(batch, hyps, scores)

    def _collect_preds(self, batch, hyps, scores) -> Dict[str, list]:
        preds = {}
        mask = batch.get("batch_mask")
        for i, vid in enumerate(batch["video_ids"]):
            if mask is not None and not bool(mask[i]):
                continue  # padded duplicate row (pad_to_batch loaders)
            entries = []
            hyps_i = hyps[i] if isinstance(hyps[i][0], list) else [hyps[i]]
            for k, hyp in enumerate(hyps_i):
                caption = to_sentence(hyp, self.vocab)
                score = scores[i][k] if isinstance(scores[i], list) \
                    else scores[i]
                entries.append({"image_id": vid, "caption": caption,
                                "score": float(np.ravel(score)[0])})
            preds[vid] = entries
        return preds

    def _make_eval_metrics_fn(self):
        """Jitted feedforward + eval-criterion metrics (concept F1@k / mAP,
        reference ``validation_step``'s eval_criterion pass)."""
        model = self.model
        criterion = self.eval_criterion

        def fn(variables, batch):
            outputs = model.apply(variables, batch, deterministic=True,
                                  collect_aux=self._needs_aux)

            def project_fn(feats, flag):
                return model.apply(variables, feats, flag,
                                   method=Captioner.project_attribute)
            _, _, metrics = criterion({**outputs, **batch}, project_fn)
            return metrics

        return jax.jit(fn)

    def validate(self, epoch: int = 0, loader=None, references=None,
                 log_prefix: str = "") -> Dict[str, float]:
        loader = loader or self.val_loader
        references = references or self.references
        preds = {}
        run_concept_metrics = ("attribute" in self.eval_criterion.crits
                               and self.variables is not None)
        if run_concept_metrics and self._eval_metrics_fn is None:
            self._eval_metrics_fn = self._make_eval_metrics_fn()
        tracker = MetricTracker()
        # fused-K decode (default): groups of eval_fused_k same-shape
        # batches run as ONE device program, paying the per-call dispatch
        # floor once per K (bench: ~2.7x the depth-2 pipelined rate);
        # eval_fused_k <= 1 falls back to the pipelined path
        fused_k = int(self.opt.get("eval_fused_k", 4))
        try:
            # a val set with fewer batches than K would otherwise pad every
            # group and silently decode len(loader)..K batches' worth of
            # wasted compute per epoch
            fused_k = max(1, min(fused_k, len(loader)))
        except TypeError:
            pass
        models = [(self.model, self.variables)]
        tkw = self._teacher_kwargs()
        val_bank = self._maybe_val_bank(loader)

        def to_device(b):
            # validation feature bank: the val set's static features also
            # upload once — every epoch's validation decode then ships
            # only indices.  The dataset keeps loading host feats (no
            # skip_feats), so any uncovered batch falls back trivially.
            served = self._bank_serve(val_bank, b) if "feats" in b else None
            return served if served is not None else device_batch(b)

        def tagged():
            for b in loader:
                db = to_device(b)
                yield (b, db), db

        if fused_k > 1 and hasattr(self.translator,
                                   "translate_batches_fused"):
            stream = self.translator.translate_batches_grouped(
                models, tagged(), fused_k, **tkw)
        else:
            # keep only host batches alive across the pass; the device
            # batch rides through translate_batches and is released per
            # iteration (retaining every db would pin HBM for the whole
            # validation set)
            originals = []

            def device_batches():
                for b in loader:
                    originals.append(b)
                    yield to_device(b)

            stream = (((originals[i], db), out) for i, (db, out) in
                      enumerate(self.translator.translate_batches(
                          models, device_batches(), **tkw)))

        for (batch, db), (hyps, scores) in stream:
            preds.update(self._collect_preds(batch, hyps, scores))
            if run_concept_metrics and "labels_attr" in batch:
                m = self._eval_metrics_fn(self.variables, db)
                tracker.update({k: float(v) for k, v in m.items()})

        scorer = COCOScorer()
        scores, _ = scorer.score(references, preds, list(preds.keys()))
        for topk in (5, 10, 20, 30, 40, 50):
            if tracker.sums.get(f"V_f1_{topk}_count"):
                scores[f"F1-{topk:02d}"] = tracker.ratio(
                    f"V_f1_{topk}_sum", f"V_f1_{topk}_count")
        if tracker.sums.get("V_ap_count"):
            scores["mAP"] = tracker.ratio("V_ap_sum", "V_ap_count")
        candidate = [scores["Bleu_4"], scores["METEOR"], scores["ROUGE_L"],
                     scores["CIDEr"]]
        scores["Sum"] = sum(s for s, flag in
                            zip(candidate, self.opt["metric_sum"]) if flag)

        for key in ("Sum", "CIDEr"):
            if scores[key] > self.best_scores.get(key, float("-inf")):
                self.best_scores[key] = scores[key]
        if self.tb:
            for k, v in scores.items():
                if isinstance(v, (int, float)):
                    self.tb.add_scalar(f"{log_prefix or 'vali'}_{k}", v, epoch)
        return scores

    # ------------------------------------------------------------------
    def test(self, loader=None, references=None, info_corpus=None,
             save_csv_path: Optional[str] = None,
             keys_added_to_scores=("seed",)) -> Dict[str, float]:
        """Best-checkpoint evaluation + caption-quality analysis + CSV
        (reference ``Wrapper.py:75-149``)."""
        loader = loader or self.test_loader
        references = references or self.references
        preds = {}
        for batch in loader:
            preds.update(self.translate_step(batch))

        # VATEX missing-video completion from an I3D model's predictions
        # (reference ``Wrapper.py:94-105``)
        if (self.opt.get("dataset") == "VATEX"
                and self.opt.get("feats", "") != "I3D"
                and self.opt.get("VATEX_I3D_preds_json", "")):
            import json
            with open(self.opt["VATEX_I3D_preds_json"]) as f:
                completion = json.load(f)
            n_missing = 0
            for key, val in completion.items():
                if key not in preds:
                    preds[key] = val
                    n_missing += 1
            if n_missing:
                print(f"- Adding {n_missing} missing predictions")

        scorer = COCOScorer()
        scores, detail = scorer.score(references, preds, list(preds.keys()))
        candidate = [scores["Bleu_4"], scores["METEOR"], scores["ROUGE_L"],
                     scores["CIDEr"]]
        scores["Sum"] = sum(s for s, flag in
                            zip(candidate, self.opt["metric_sum"]) if flag)

        for key in keys_added_to_scores:
            v = self.opt.get(key)
            scores[key] = ("-".join(map(str, v))
                           if isinstance(v, (list, tuple)) else v)

        if info_corpus is not None:
            ave_length, novel, unique, usage = analyze_length_novel_unique(
                info_corpus["captions"], preds, vocab=self.vocab,
                splits=info_corpus["info"]["split"], n=1)
            scores.update({"ave_length": ave_length, "novel": novel,
                           "unique": unique, "usage": usage})

        if self.opt.get("save_csv", False):
            path = save_csv_path or self.opt["checkpoint_path"]
            save_dict_to_csv(path, self.opt.get("csv_name",
                                                "test_result.csv"), scores)

        # prediction/detail dumps (reference ``Wrapper.py:136-140`` +
        # ``translate.py:78-81``)
        import json
        if self.opt.get("json_path", ""):
            os.makedirs(self.opt["json_path"], exist_ok=True)
            with open(os.path.join(self.opt["json_path"],
                                   self.opt.get("json_name", "preds.json")),
                      "w") as f:
                json.dump(preds, f)
        if self.opt.get("save_detail_scores_path", ""):
            p = self.opt["save_detail_scores_path"]
            os.makedirs(os.path.dirname(p) or ".", exist_ok=True)
            with open(p, "w") as f:
                json.dump(detail, f)
        return scores

    def load_best(self):
        from care_tpu.training.checkpoints import load_checkpoint
        path = self.ckpt_manager.best_path
        if path:
            self.variables, _, _ = load_checkpoint(path, self.variables)
        return self.variables
