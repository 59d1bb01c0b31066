"""Import the reference PyTorch model code (read-only) for parity testing.

Stubs the reference's unavailable third-party deps (pytorch_lightning,
pycocoevalcap) so its pure-torch model modules import; provides weight
transplantation from the reference's torch state_dict into our flax param
tree. Nothing from the reference is copied — it is executed in place as the
ground truth for logit-level parity tests.
"""

import sys
import types



def import_reference():
    """Make `/root/reference` importable with stubbed heavy deps; returns
    the reference's get_framework."""
    # APPEND (never prepend): the repo root also has `train`/`translate`
    # top-level modules, and prepending made a later `import train` in the
    # same pytest process resolve to /root/reference/train.py (which dies on
    # `import wget`). Appending keeps repo modules winning while still
    # letting the reference's own `models`/`config`/`misc` packages resolve
    # (no same-named packages exist earlier on sys.path).
    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")

    import torch

    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")
        pl.LightningModule = torch.nn.Module
        pl.Trainer = object
        pl.seed_everything = lambda *a, **k: None

        class _CB:
            pass
        cbs = types.ModuleType("pytorch_lightning.callbacks")
        cbs.ModelCheckpoint = _CB
        cbs.LearningRateMonitor = _CB
        pl.callbacks = cbs
        sys.modules["pytorch_lightning"] = pl
        sys.modules["pytorch_lightning.callbacks"] = cbs

    # pycocoevalcap (Java metric wrappers) — scoring isn't exercised
    for name in ["pycocoevalcap", "pycocoevalcap.bleu",
                 "pycocoevalcap.bleu.bleu", "pycocoevalcap.rouge",
                 "pycocoevalcap.rouge.rouge", "pycocoevalcap.cider",
                 "pycocoevalcap.cider.cider", "pycocoevalcap.meteor",
                 "pycocoevalcap.meteor.meteor", "pycocoevalcap.tokenizer",
                 "pycocoevalcap.tokenizer.ptbtokenizer"]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for cls in ["Bleu", "Rouge", "Cider", "Meteor", "PTBTokenizer"]:
                setattr(mod, cls, object)
            sys.modules[name] = mod

    from models.Framework import get_framework  # noqa: E402
    return get_framework


# ---------------------------------------------------------------------------
# weight transplantation now lives in the framework proper
# (care_tpu/models/transplant.py, driving misc_tools/convert_reference_ckpt.py);
# re-exported here so parity tests keep their historical import site.
# ---------------------------------------------------------------------------

from care_tpu.models.transplant import (  # noqa: E402,F401
    _set,
    transplant_transformer_weights,
    transplant_salstm_weights,
    transplant_pointer_weights,
    transplant_length_predictor,
    transplant_highwaybn_encoder,
    transplant_reference_state_dict,
    strip_wrapper_prefix,
)
