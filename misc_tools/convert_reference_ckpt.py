"""Convert a reference (PyTorch) CARE checkpoint into our format.

The reference trains with pytorch_lightning and saves checkpoints as
``{'state_dict': ..., 'hyper_parameters': {'opt': ...}}`` (consumed by
``models/__init__.py:115`` / ``Wrapper.load_from_checkpoint``). This tool
maps every torch parameter into our flax ``Captioner`` tree
(``care_tpu/models/transplant.py`` — the same mapping the parity suite
uses to pin logit equality at 2e-4) and writes our msgpack + opt-json
checkpoint, so a reference user's trained model serves directly:

    python misc_tools/convert_reference_ckpt.py best.ckpt -o best_tpu.ckpt
    python translate.py -cp best_tpu.ckpt --base_data_path /data

Unmapped torch *parameters* (an unsupported sub-module) fail the
conversion unless ``--allow-unmapped`` is given; deterministic buffers
(position ids, sinusoidal tables, BN step counters) are skipped silently.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from care_tpu.models import build_captioner                     # noqa: E402
from care_tpu.models.loading import init_variables_template     # noqa: E402
from care_tpu.models.transplant import (                        # noqa: E402
    strip_wrapper_prefix, transplant_reference_state_dict)
from care_tpu.training.checkpoints import save_checkpoint       # noqa: E402


def convert(in_path: str, out_path: str, from_teacher: bool = False,
            allow_unmapped: bool = False, verbose: bool = True) -> dict:
    """Returns the conversion report (consumed/buffers/unmapped keys)."""
    import torch
    ckpt = torch.load(in_path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        state_dict = ckpt["state_dict"]
        hp = ckpt.get("hyper_parameters", {})
        if not isinstance(hp, dict):        # argparse.Namespace
            hp = vars(hp)
        opt = hp.get("opt")
    else:                                   # bare state_dict
        state_dict, opt = ckpt, None
    if opt is None:
        raise SystemExit(
            "checkpoint has no hyper_parameters['opt'] — pass a Lightning "
            "checkpoint saved by the reference's train.py")
    if not isinstance(opt, dict):
        opt = vars(opt)

    selected, other = strip_wrapper_prefix(
        state_dict, source="teacher_captioner" if from_teacher
        else "captioner")
    if from_teacher and not selected:
        raise SystemExit("--from-teacher: checkpoint has no "
                         "teacher_captioner keys (not an InterplayModel run)")

    import jax
    from flax.core import unfreeze
    model = build_captioner(opt)
    with jax.default_device(jax.devices("cpu")[0]):
        template = init_variables_template(model, opt)
    variables = jax.tree.map(np.asarray, unfreeze(template))

    variables, report = transplant_reference_state_dict(
        selected, variables, opt, verbose=verbose)
    if report["unmapped"] and not allow_unmapped:
        raise SystemExit(
            f"{len(report['unmapped'])} torch parameters were not mapped "
            f"(first: {report['unmapped'][:5]}); rerun with "
            "--allow-unmapped to convert anyway")

    save_checkpoint(out_path, variables, opt, metadata={
        "converted_from": os.path.abspath(in_path),
        "converted_module": "teacher_captioner" if from_teacher
                            else "captioner",
        "unmapped_torch_keys": report["unmapped"],
    })
    if verbose:
        n = len(report["consumed"])
        extra = (", UNMAPPED: %d" % len(report["unmapped"])
                 if report["unmapped"] else "")
        print(f"wrote {out_path} ({n} torch tensors mapped{extra})")
    return report


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("checkpoint", help="reference .ckpt path")
    ap.add_argument("-o", "--out", required=True,
                    help="output path for our checkpoint")
    ap.add_argument("--from-teacher", action="store_true",
                    help="convert the mean-teacher (teacher_captioner) copy "
                         "of an InterplayModel checkpoint instead of the "
                         "student")
    ap.add_argument("--allow-unmapped", action="store_true",
                    help="write the checkpoint even if some torch "
                         "parameters could not be mapped")
    args = ap.parse_args(argv)
    convert(args.checkpoint, args.out, from_teacher=args.from_teacher,
            allow_unmapped=args.allow_unmapped)


if __name__ == "__main__":
    main()
