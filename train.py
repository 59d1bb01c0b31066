"""Training CLI.

Parity target: reference ``train.py:30-145`` — seeds, builds the wrapper
(optionally loading/freezing pretrained weights), builds train/val/test
loaders, runs the fit loop, reloads the best checkpoint, runs the test
pass, writes CSV results.

Usage matches the reference surface:
    python train.py --dataset MSRVTT --method Transformer --task CARE \
        --feats ViT -dm_flags VA -pm_flags VAT
"""

import argparse
import json
import os
import random

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-d", "--dataset", type=str, default="MSRVTT",
                   choices=["MSVD", "MSRVTT", "VATEX"])
    p.add_argument("-m", "--modality", type=str, default="mi")
    p.add_argument("-method", "--method", type=str, default="")
    p.add_argument("-task", "--task", type=str, default="")
    p.add_argument("-feats", "--feats", type=str, default="")
    p.add_argument("-arch", "--arch", type=str, default="base")
    p.add_argument("-setup", "--setup", type=str, default="naive")
    p.add_argument("-scope", "--scope", type=str, default="")
    p.add_argument("-seed", "--seed", type=int, default=0)
    p.add_argument("-e", "--epochs", type=int, default=None)
    p.add_argument("-b", "--batch_size", type=int, default=None)
    p.add_argument("--base_data_path", type=str, default="")
    p.add_argument("-dm_flags", "--decoder_modality_flags", type=str)
    p.add_argument("-pm_flags", "--predictor_modality_flags", type=str)
    p.add_argument("--load_model_weights_from", type=str, default="")
    p.add_argument("--mesh", type=str, default="",
                   help="device mesh, e.g. 'data=8' or 'data=4,model=2'; "
                        "empty = single device")
    p.add_argument("--override", type=str, default="",
                   help="JSON dict of extra opt overrides")
    p.add_argument("--devices", type=str, default="",
                   help="accepted for script parity with the reference CLI "
                        "(GPU index); device selection on TPU is via JAX / "
                        "--mesh, so this is a no-op")
    # every remaining option key becomes a flag (reference opts.py:15-257)
    from care_tpu.config.cli import add_opt_arguments
    add_opt_arguments(p)
    return p.parse_args(argv)


def parse_mesh(spec: str):
    if not spec:
        return None
    from care_tpu.parallel import make_mesh
    shape = {}
    for part in spec.split(","):
        axis, size = part.split("=")
        shape[axis.strip()] = int(size)
    return make_mesh(shape)


def seed_everything(seed: int):
    random.seed(seed)
    np.random.seed(seed)


def run(opt, mesh=None):
    from care_tpu.data import get_loader
    from care_tpu.data.corpus import load_info_corpus, load_references
    from care_tpu.training.trainer import Trainer
    from care_tpu.utils.logger import save_dict_to_csv

    seed_everything(opt["seed"])

    info_corpus = load_info_corpus(opt["info_corpus"])
    references = load_references(opt["reference"])
    vocab = info_corpus["info"]["itow"]

    # eval loaders pad partial batches to one compiled shape (batch_mask
    # marks real rows and translate_step drops padded ones); the train
    # loader stays exact so the loss weighs every sample once — its final
    # partial batch costs at most one extra compile
    train_loader = get_loader(opt, "train")
    val_loader = get_loader(opt, "validate", is_validation=True,
                            not_shuffle=True,
                            batch_size=opt.get("eval_batch_size", 128),
                            pad_to_batch=True)
    test_loader = get_loader(opt, "test", not_shuffle=True,
                             batch_size=opt.get("eval_batch_size", 128),
                             pad_to_batch=True)

    trainer_cls = Trainer
    if opt.get("wrapper") == "InterplayModel":
        from care_tpu.training.mean_teacher import MeanTeacherTrainer
        trainer_cls = MeanTeacherTrainer
    trainer = trainer_cls(
        opt, train_loader=train_loader, val_loader=val_loader,
        test_loader=test_loader, references=references, vocab=vocab,
        log_dir=os.path.join(opt["checkpoint_path"], "tb"), mesh=mesh)

    if opt.get("load_model_weights_from"):
        from care_tpu.models.loading import (
            load_teacher_weights_into_student, get_vocab_mapping)
        from care_tpu.training.checkpoints import load_checkpoint
        first = next(iter(train_loader))
        trainer.init_model(first)
        _, teacher_opt, _ = load_checkpoint(opt["load_model_weights_from"])
        vm = get_vocab_mapping(opt, teacher_opt) if teacher_opt else None
        trainer.variables = load_teacher_weights_into_student(
            trainer.variables, opt["load_model_weights_from"], vm)

    trainer.fit()
    trainer.load_best()
    scores = trainer.test(info_corpus=info_corpus)
    print("- test scores:", {k: v for k, v in scores.items()})
    return scores


if __name__ == "__main__":
    from care_tpu.utils.device import honor_jax_platforms
    honor_jax_platforms()
    from care_tpu.config import get_opt

    args = parse_args()
    from care_tpu.config.cli import overrides_from_args
    overrides = overrides_from_args(args, exclude=("override", "mesh",
                                                   "devices"))
    if args.override:
        overrides["final_overrides"] = json.loads(args.override)
    opt = get_opt(overrides)
    os.makedirs(opt["checkpoint_path"], exist_ok=True)
    with open(os.path.join(opt["checkpoint_path"], "opt_info.json"),
              "w") as f:
        from care_tpu.training.checkpoints import _jsonable
        json.dump(_jsonable(opt), f, indent=1)
    run(opt, mesh=parse_mesh(args.mesh))
