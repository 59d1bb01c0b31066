"""Classification heads (reference ``models/Head.py``)."""

from typing import Any, Dict

import flax.linen as nn

from care_tpu.models.common import Dense


class NaiveHead(nn.Module):
    """Single tied-shape linear head, no bias (reference ``Head.py:26-32``)."""
    opt: Dict[str, Any]

    @nn.compact
    def __call__(self, hidden_states, deterministic: bool = True):
        return Dense(self.opt["vocab_size"], use_bias=False,
                     name="tgt_word_prj")(hidden_states)


class MLPHead(nn.Module):
    """2-layer tanh head (reference ``Head.py:35-49``)."""
    opt: Dict[str, Any]

    @nn.compact
    def __call__(self, hidden_states, deterministic: bool = True):
        x = Dense(self.opt["dim_hidden"], name="dense")(hidden_states)
        x = nn.tanh(x)
        x = nn.Dropout(self.opt["hidden_dropout_prob"])(
            x, deterministic=deterministic)
        return Dense(self.opt["vocab_size"], name="tgt_word_prj")(x)


def get_cls_head(opt: dict) -> nn.Module:
    mapping = {"NaiveHead": NaiveHead, "MLPHead": MLPHead}
    name = opt["cls_head"]
    if name not in mapping:
        raise ValueError(f"unknown cls_head `{name}`")
    return mapping[name](opt, name="cls_head")
