"""Training variants: RNN beam decode, NACF (visual-word) training,
mean teacher, plateau scheduler."""

import numpy as np
import jax.numpy as jnp
import pytest

from care_tpu.decoding import get_translator
from helpers import tiny_opt, tiny_model_and_batch
from test_train_e2e import make_synthetic_env


def test_rnn_beam_decode():
    opt = tiny_opt(method="SALSTM", vocab_size=40, beam_size=3)
    model, variables, batch = tiny_model_and_batch(opt, batch_size=2)
    tr = get_translator(opt)
    hyps, scores = tr.translate_batch([(model, variables)],
                                      {"feats": batch["feats"]})
    assert len(hyps) == 2
    for h in hyps:
        assert 1 <= len(h[0]) <= opt["max_len"] - 1


def test_nacf_trains_on_synthetic(tmp_path):
    from care_tpu.data import get_loader
    from care_tpu.training.trainer import Trainer

    opt, corpus, refs = make_synthetic_env(
        tmp_path, method="NACF",
        extra={"epochs": 1,
               "final_overrides": {"with_teacher_during_training": False,
                                   "load_teacher_weights": False}})
    assert opt["visual_word_generation"] and opt["decoding_type"] == "NARFormer"
    assert "length" in opt["crits"]

    train_loader = get_loader(opt, "train")
    batch = next(iter(train_loader))
    assert isinstance(batch["input_ids"], list) and len(batch["input_ids"]) == 2

    val_loader = get_loader(opt, "validate", is_validation=True,
                            not_shuffle=True)
    trainer = Trainer(opt, train_loader=train_loader, val_loader=val_loader,
                      references=refs, vocab=corpus["info"]["itow"])
    trainer.fit(epochs=1)
    scores = trainer.validate(0)
    assert np.isfinite(scores["CIDEr"])


def test_mean_teacher_trains(tmp_path):
    from care_tpu.data import get_loader
    from care_tpu.training.mean_teacher import MeanTeacherTrainer

    opt, corpus, refs = make_synthetic_env(
        tmp_path, extra={"epochs": 1, "wrapper": "InterplayModel"})
    train_loader = get_loader(opt, "train")
    val_loader = get_loader(opt, "validate", is_validation=True,
                            not_shuffle=True)
    trainer = MeanTeacherTrainer(opt, train_loader=train_loader,
                                 val_loader=val_loader, references=refs,
                                 vocab=corpus["info"]["itow"])
    trainer.fit(epochs=1)
    # teacher params differ from student (EMA has moved a little) but share
    # structure
    import jax
    s = jax.tree.leaves(trainer.variables["params"])
    t = jax.tree.leaves(trainer.teacher_variables["params"])
    assert len(s) == len(t)
    diffs = [float(jnp.max(jnp.abs(a - b))) for a, b in zip(s, t)]
    assert max(diffs) > 0


def test_plateau_controller():
    from care_tpu.training.optim import PlateauController
    c = PlateauController({"lr_monitor_mode": "max", "lr_monitor_patience": 1,
                           "lr_decay": 0.5, "min_lr": 1e-6})
    assert c.update({"CIDEr": 1.0}) == 1.0
    assert c.update({"CIDEr": 0.9}) == 1.0   # 1 bad epoch <= patience
    assert c.update({"CIDEr": 0.8}) == 0.5   # second bad epoch -> decay
    assert c.update({"CIDEr": 2.0}) == 0.5   # improvement resets counter
    assert c.current_lr(1e-3) == pytest.approx(5e-4)


@pytest.mark.parametrize("method", ["SALSTM", "TopDown"])
def test_rnn_scheduled_sampling_jitted_step(method):
    """The RNN training forward is one nn.scan: the jitted trainer step
    must trace with a *traced* ss_prob (regression: the unrolled loop
    branched on the tracer), and sampling must actually change the loss."""
    import jax
    from care_tpu.training.trainer import Trainer

    opt = tiny_opt(method=method, vocab_size=40, beam_size=3,
                   scheduled_sampling_start=0)
    model, variables, batch = tiny_model_and_batch(opt)
    tr = Trainer(opt, train_loader=None, val_loader=None, references={},
                 vocab={})
    tr.variables = variables
    tr.model = model
    tr._build_tx(2)
    fn = tr._make_train_step()
    b = {**batch, "labels": batch["input_ids"]}

    def loss_at(ss):
        # copy donated args (params, opt_state) so repeated calls are safe
        out = fn(jax.tree.map(jnp.array, variables["params"]),
                 {k: v for k, v in variables.items() if k != "params"},
                 jax.tree.map(jnp.array, tr.opt_state), b,
                 jax.random.PRNGKey(0), ss)
        return float(out[3])

    l0, l1 = loss_at(0.0), loss_at(1.0)
    assert np.isfinite(l0) and np.isfinite(l1)
    # full sampling feeds model samples instead of gold tokens -> loss moves
    assert abs(l0 - l1) > 1e-6


def test_plateau_rebuild_preserves_adam_moments(tmp_path):
    """When the plateau controller scales the LR, the trainer rebuilds the
    optimizer chain but keeps the live opt_state — Adam moments and the
    step count must carry across the rebuild (PARITY.md claim)."""
    import jax
    import optax
    from care_tpu.data import get_loader
    from care_tpu.training.trainer import Trainer

    opt, corpus, refs = make_synthetic_env(
        tmp_path, extra={"epochs": 3,
                         "final_overrides": {"lr_scheduler_type": "plateau",
                                             "lr_monitor_patience": 0,
                                             "lr_decay": 0.5}})
    train_loader = get_loader(opt, "train")
    tr = Trainer(opt, train_loader=train_loader, val_loader=None,
                 references=refs, vocab=corpus["info"]["itow"])

    # strictly decreasing fake validation scores -> scale drops every
    # epoch after the first
    scripted = iter([{"CIDEr": 1.0}, {"CIDEr": 0.5}, {"CIDEr": 0.2}])
    tr.val_loader = object()  # truthy so fit() calls validate
    tr.validate = lambda epoch: next(scripted)

    tr.fit()
    assert tr._plateau.scale == pytest.approx(0.25)

    adam_states = [s for s in jax.tree.leaves(
        tr.opt_state,
        is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
        if isinstance(s, optax.ScaleByAdamState)]
    assert adam_states, "no adam state found"
    total_steps = 3 * len(train_loader)
    for s in adam_states:
        # count kept accumulating across both LR rebuilds...
        assert int(s.count) == total_steps
        # ...and the second moments are warm, not re-initialised
        nu_norm = sum(float(jnp.sum(jnp.abs(l)))
                      for l in jax.tree.leaves(s.nu))
        assert nu_norm > 0
