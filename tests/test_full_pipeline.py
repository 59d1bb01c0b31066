"""Full-pipeline integration: ARB teacher -> NACF student with teacher
weights + decode-time rescoring; train.py / translate.py CLI smoke."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from care_tpu.config import get_opt
from care_tpu.data import get_loader
from care_tpu.data.corpus import write_synthetic_dataset
from care_tpu.training.trainer import Trainer

from test_train_e2e import make_synthetic_env


def test_arb_teacher_then_nacf_student(tmp_path):
    # 1) train the AR teacher (ARB) briefly and checkpoint it
    opt_t, corpus, refs = make_synthetic_env(tmp_path, method="ARB")
    opt_t["checkpoint_path"] = os.path.join(str(tmp_path), "exps", "ARB")
    train_loader = get_loader(opt_t, "train")
    val_loader = get_loader(opt_t, "validate", is_validation=True,
                            not_shuffle=True)
    teacher_trainer = Trainer(opt_t, train_loader=train_loader,
                              val_loader=val_loader, references=refs,
                              vocab=corpus["info"]["itow"])
    teacher_trainer.fit(epochs=1)
    teacher_ckpt = os.path.join(opt_t["checkpoint_path"], "best.ckpt")
    assert os.path.exists(teacher_ckpt)

    # 2) NACF student: load teacher weights (same vocab -> no remap), then
    #    decode with teacher rescoring
    # separate directory (same generator/seed -> identical corpus) so the
    # teacher's lazily-opened HDF5 handles aren't truncated
    opt_s, _, _ = make_synthetic_env(
        tmp_path / "student", method="NACF",
        extra={"final_overrides": {"teacher_path": teacher_ckpt,
                                   "masking_decision": True}})
    opt_s["checkpoint_path"] = os.path.join(str(tmp_path), "exps", "NACF")
    s_train = get_loader(opt_s, "train")
    s_val = get_loader(opt_s, "validate", is_validation=True,
                       not_shuffle=True)
    student = Trainer(opt_s, train_loader=s_train, val_loader=s_val,
                      references=refs, vocab=corpus["info"]["itow"])
    student.init_model(next(iter(s_train)))

    # teacher-weight surgery into the student
    from care_tpu.models.loading import (load_teacher_weights_into_student,
                                         get_vocab_mapping)
    vm = get_vocab_mapping(opt_s, opt_t)   # identical corpora -> None
    assert vm is None
    student.variables = load_teacher_weights_into_student(
        student.variables, teacher_ckpt, vm, verbose=False)

    student.fit(epochs=1)
    scores = student.validate(0)           # attaches the AR teacher for NAR
    assert np.isfinite(scores["CIDEr"])
    assert student._get_teacher()[0] is not None


@pytest.mark.slow
def test_cli_train_and_translate(tmp_path):
    overrides = {
        "dataset": "MSRVTT", "method": "Transformer", "task": "Base",
        "feats": "ViT", "modality": "mi", "max_len": 12, "n_frames": 8,
        "batch_size": 8, "beam_size": 2, "epochs": 1,
    }
    opt = get_opt(overrides, read_vocab=False, resolve_paths=False)
    opt["dim_m"], opt["dim_i"] = 16, 16
    root, paths, corpus, refs = write_synthetic_dataset(str(tmp_path), opt,
                                                        n_videos=15)
    from helpers import cpu_subprocess_env
    env = cpu_subprocess_env()
    override_json = json.dumps({
        "dim_m": 16, "dim_i": 16,
        "feats_m_name": ["synthetic_m.hdf5"],
        "feats_i_name": ["synthetic_i.hdf5"],
    })
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # run the CLIs from tmp_path: BASE_CHECKPOINT_PATH is cwd-relative
    # ("./exps"), and running from the repo would accumulate checkpoint +
    # sweep-CSV state in repo/exps across test sessions (the --save_csv
    # contract APPENDS, reference behavior)
    env["PYTHONPATH"] = repo
    cmd = [sys.executable, os.path.join(repo, "train.py"),
           "--dataset", "MSRVTT",
           "--method", "Transformer", "--task", "Base", "--feats", "ViT",
           "--modality", "mi", "--epochs", "1", "--batch_size", "8",
           "--base_data_path", str(tmp_path),
           "--override", override_json]
    r = subprocess.run(cmd, cwd=str(tmp_path), env=env, capture_output=True,
                       text=True, timeout=500)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "test scores" in r.stdout

    # find the checkpoint the run produced and evaluate it via translate.py
    import glob
    ckpts = glob.glob(os.path.join(str(tmp_path), "exps", "MSRVTT",
                                   "Transformer", "Base", "*", "best.ckpt"))
    assert ckpts, "no checkpoint written"
    r2 = subprocess.run(
        [sys.executable, os.path.join(repo, "translate.py"), "-cp", ckpts[0],
         "--base_data_path", str(tmp_path), "--batch_size", "8"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=500)
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "CIDEr" in r2.stdout or "n_frames" in r2.stdout

    # n_frames sensitivity sweep (reference translate.py:92-103): rows
    # accumulate into ./results_loop/n_frames.csv; --save_csv also appends
    # a row next to the checkpoint
    loop_cwd = tmp_path / "looprun"
    loop_cwd.mkdir()
    env2 = dict(env, PYTHONPATH=repo)
    r3 = subprocess.run(
        [sys.executable, os.path.join(repo, "translate.py"),
         "-cp", ckpts[0], "--base_data_path", str(tmp_path),
         "--batch_size", "8", "--loop_n_frames", "4", "8",
         "--save_csv", "--csv_name", "sweep.csv"],
        cwd=str(loop_cwd), env=env2, capture_output=True, text=True,
        timeout=500)
    assert r3.returncode == 0, r3.stderr[-3000:]
    import pandas as pd
    loop_csv = loop_cwd / "results_loop" / "n_frames.csv"
    assert loop_csv.exists()
    df = pd.read_csv(loop_csv)
    assert sorted(df["n_frames"].tolist()) == [4, 8]
    assert "CIDEr" in df.columns and "scope" in df.columns
    sweep = pd.read_csv(os.path.join(os.path.dirname(ckpts[0]), "sweep.csv"))
    assert len(sweep) == 2
