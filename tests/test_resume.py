"""Mid-run resume equivalence: an interrupted+resumed run must reproduce
the uninterrupted run exactly (losses and params), single-device and on a
mesh with sharded (no host-gather) state restore.

Covers ``TrainStateCheckpointer`` (Orbax) + ``Trainer._try_resume`` — a
capability beyond the reference (which always restarts from scratch).
"""

import os

import numpy as np
import pytest

import jax

from care_tpu.config import get_opt
from care_tpu.data import get_loader
from care_tpu.training.trainer import Trainer

from test_train_e2e import make_synthetic_env


def _run(opt_overrides, tmp_path, epochs, mesh=None, resume=False,
         state_dir=None, env=None):
    opt, corpus, refs = env
    opt = dict(opt)
    opt["epochs"] = epochs
    opt["resume"] = resume
    if state_dir:
        opt["train_state_dir"] = state_dir
    opt.update(opt_overrides)

    train_loader = get_loader(opt, "train")
    trainer = Trainer(opt, train_loader=train_loader, val_loader=None,
                      references=refs, vocab=corpus["info"]["itow"],
                      mesh=mesh)
    first = next(iter(train_loader))
    trainer.init_model(first)
    trainer._build_tx(len(train_loader))

    losses = {}
    real_step = trainer._make_train_step

    def make_step():
        fn = real_step()

        def wrapped(params, extra, opt_state, b, rng, ss):
            out = fn(params, extra, opt_state, b, rng, ss)
            losses.setdefault(trainer._cur_epoch, []).append(float(out[3]))
            return out
        return wrapped

    trainer._make_train_step = make_step

    # track the epoch for loss bucketing
    orig_set_epoch = train_loader.set_epoch

    def set_epoch(e):
        trainer._cur_epoch = e
        orig_set_epoch(e)
    train_loader.set_epoch = set_epoch

    trainer.fit(epochs=epochs)
    mean_losses = {e: float(np.mean(v)) for e, v in losses.items()}
    return trainer, mean_losses


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("resume_data")
    opt, corpus, refs = make_synthetic_env(tmp)
    opt["epochs"] = 4
    return opt, corpus, refs


def test_resume_matches_uninterrupted(env, tmp_path):
    state_dir = str(tmp_path / "state")

    # uninterrupted 4-epoch run (no resume machinery at all)
    full, full_losses = _run({}, tmp_path, epochs=4, env=env)

    # interrupted: 2 epochs with state saving, then a fresh trainer resumes
    _, first_losses = _run({}, tmp_path, epochs=2, resume=True,
                           state_dir=state_dir, env=env)
    resumed, resumed_losses = _run({}, tmp_path, epochs=4, resume=True,
                                   state_dir=state_dir, env=env)

    # epochs 0-1 trained before the interruption, 2-3 after resume
    assert set(resumed_losses) == {2, 3}
    assert first_losses[0] == pytest.approx(full_losses[0], rel=1e-6)
    for e in (2, 3):
        assert resumed_losses[e] == pytest.approx(full_losses[e], rel=1e-5), \
            (e, resumed_losses, full_losses)

    flat_a = jax.tree.leaves(full.variables["params"])
    flat_b = jax.tree.leaves(resumed.variables["params"])
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_resume_on_mesh_preserves_sharding(env, tmp_path):
    from care_tpu.parallel import make_mesh
    if len(jax.devices("cpu")) < 4:
        pytest.skip("needs 4 CPU devices")
    mesh = make_mesh({"data": 4}, devices=jax.devices("cpu")[:4])
    state_dir = str(tmp_path / "mesh_state")

    _, first_losses = _run({}, tmp_path, epochs=1, mesh=mesh, resume=True,
                           state_dir=state_dir, env=env)
    resumed, resumed_losses = _run({}, tmp_path, epochs=2, mesh=mesh,
                                   resume=True, state_dir=state_dir, env=env)
    assert set(resumed_losses) == {1}

    # restored params keep their mesh shardings (no host-gathered arrays)
    leaf = jax.tree.leaves(resumed.variables["params"])[0]
    assert hasattr(leaf, "sharding")
    assert getattr(leaf.sharding, "mesh", None) is not None

    # and the resumed mesh run matches the single-device trajectory
    full, full_losses = _run({}, tmp_path, epochs=2, env=env)
    assert first_losses[0] == pytest.approx(full_losses[0], rel=1e-4)
    # epoch 1 compares a DP-4 run against a single-device run AFTER a full
    # epoch of optimizer updates: per-step rounding (DP partial-sum order,
    # fused-xent online-softmax order) drifts the trajectories a few 1e-4
    # relative — same-configuration resume exactness is locked separately
    # above and in test_resume_reproduces_trajectory
    assert resumed_losses[1] == pytest.approx(full_losses[1], rel=3e-3)
