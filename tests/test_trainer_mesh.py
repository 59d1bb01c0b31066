"""Data-parallel training through the Trainer on the 8-virtual-CPU mesh."""

import numpy as np
import pytest
import jax

from care_tpu.data import get_loader
from care_tpu.parallel import make_mesh, DATA_AXIS
from care_tpu.training.trainer import Trainer

from test_train_e2e import make_synthetic_env


def test_trainer_fits_on_data_mesh(tmp_path):
    devices = jax.devices("cpu")
    if len(devices) < 4:
        pytest.skip("needs virtual CPU devices")
    mesh = make_mesh({DATA_AXIS: 4}, devices=devices[:4])

    opt, corpus, refs = make_synthetic_env(tmp_path, extra={"epochs": 1,
                                                            "batch_size": 8})
    train_loader = get_loader(opt, "train", pad_to_batch=True)
    trainer = Trainer(opt, train_loader=train_loader, references=refs,
                      vocab=corpus["info"]["itow"], mesh=mesh)
    trainer.fit(epochs=1)
    # params came back finite and sharded training ran
    leaves = jax.tree.leaves(trainer.variables["params"])
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
