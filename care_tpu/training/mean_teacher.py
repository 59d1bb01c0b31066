"""Mean-teacher training (reference ``InterplayModel``, ``Wrapper.py:550-614``).

A duplicate captioner (the teacher) is updated as an EMA of the student;
training adds an MSE logits-distillation term; evaluation uses the teacher
(configurable via ``eval_model``). The EMA update and the distillation term
are folded into the same jitted step.
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp

from care_tpu.models.framework import Captioner
from care_tpu.training.trainer import Trainer


class MeanTeacherTrainer(Trainer):
    def __init__(self, opt: dict, **kwargs):
        super().__init__(opt, **kwargs)
        self.teacher_variables = None

    def init_model(self, example_batch, seed=None):
        variables = super().init_model(example_batch, seed)
        self.teacher_variables = jax.tree.map(jnp.array, variables)
        return variables

    def _make_train_step(self):
        model = self.model
        criterion = self.criterion
        tx = self.tx
        opt = self.opt
        distillation_weight = opt.get("distillation_weight", 0.01)
        ema_weight = opt.get("ema_weight", 0.999)
        collect_aux = self._needs_aux

        def train_step(params, extra_vars, teacher_params, opt_state, batch,
                       rng, ss_prob):
            dropout_rng, sampling_rng = jax.random.split(rng)
            rngs = {"dropout": dropout_rng, "sampling": sampling_rng}

            teacher_out = model.apply(
                {"params": teacher_params, **extra_vars}, batch,
                deterministic=True, collect_aux=False)
            teacher_logits = jax.lax.stop_gradient(teacher_out["logits"])

            def loss_fn(p):
                vs = {"params": p, **extra_vars}
                outputs = model.apply(
                    vs, batch, deterministic=False,
                    schedule_sampling_prob=ss_prob,
                    collect_aux=collect_aux, rngs=rngs)

                def project_fn(feats, flag):
                    return model.apply(vs, feats, flag,
                                       method=Captioner.project_attribute)

                cap_loss, losses, metrics = criterion(
                    {**outputs, **batch}, project_fn)
                logits = outputs["logits"]
                if isinstance(logits, list):
                    logits = logits[-1]
                t_logits = (teacher_logits[-1]
                            if isinstance(teacher_logits, list)
                            else teacher_logits)
                dist_loss = jnp.mean((logits - t_logits) ** 2)
                total = cap_loss + distillation_weight * dist_loss
                losses = {**losses, "Distillation Loss": dist_loss}
                return total, (losses, metrics, {})

            (loss, (losses, metrics, mutated)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt_state = tx.update(grads, opt_state, params)
            new_params = jax.tree.map(lambda a, b: a + b, params, updates)
            # EMA teacher update
            new_teacher = jax.tree.map(
                lambda t, s: ema_weight * t + (1 - ema_weight) * s,
                teacher_params, new_params)
            return (new_params, new_teacher, mutated, new_opt_state, loss,
                    losses, metrics)

        return jax.jit(train_step)

    def fit(self, epochs=None):
        # specialized loop: same structure as Trainer.fit but with the
        # teacher params threaded through the step
        import time
        import numpy as np
        from care_tpu.utils.logger import AverageMeter
        from care_tpu.training.trainer import device_batch, \
            schedule_sampling_prob

        opt = self.opt
        epochs = epochs if epochs is not None else opt["epochs"]
        if self.variables is None:
            self.init_model(next(iter(self.train_loader)))
        if self.tx is None:
            self._build_tx(max(len(self.train_loader), 1))

        rng = jax.random.PRNGKey(opt.get("seed", 0) + 1)
        step_fn = self._make_train_step()
        for epoch in range(epochs):
            self.train_loader.set_epoch(epoch)
            ss_prob = schedule_sampling_prob(opt, epoch)
            loss_meter = AverageMeter()
            for batch in self.train_loader:
                rng, k = jax.random.split(rng)
                b = device_batch(batch)
                params = self.variables["params"]
                extra = {k2: v for k2, v in self.variables.items()
                         if k2 != "params"}
                (params, teacher, mutated, self.opt_state, loss, losses,
                 metrics) = step_fn(params, extra,
                                    self.teacher_variables["params"],
                                    self.opt_state, b, k, ss_prob)
                self.variables = {"params": params, **extra, **mutated}
                self.teacher_variables = {
                    **self.teacher_variables, "params": teacher}
                loss_meter.update(float(loss))
                self.global_step += 1

            scores = {}
            if self.val_loader is not None:
                scores = self.validate(epoch)
            self.ckpt_manager.on_epoch_end(epoch, self._eval_variables(),
                                           opt, scores)
            print(f"- epoch {epoch}: loss={loss_meter.avg:.4f} "
                  f"{self._fmt_scores(scores)}")
        return self.best_scores

    def _eval_variables(self):
        if self.opt.get("eval_model", "teacher") == "teacher":
            return {**self.variables,
                    "params": self.teacher_variables["params"]}
        return self.variables

    def translate_step(self, batch):
        # evaluate with the teacher (reference swap_captioners)
        saved = self.variables
        self.variables = self._eval_variables()
        try:
            return super().translate_step(batch)
        finally:
            self.variables = saved
