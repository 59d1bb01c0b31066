"""In-model visual backbones for end-to-end training/inference.

Parity target: reference ``models/Backbone.py`` — an optional per-modality
backbone (only the image stream is supported) that encodes raw frames
``[B, n_frames, H, W, 3]`` into features inside the captioner, so
feature-extraction and captioning fuse into one XLA program.

Backbone registry:
* ``clip~ViT-B/32`` (and other ViT variants): the flax CLIP visual tower
  from ``care_tpu.pretreatment.clip`` (weights converted from a local
  OpenAI checkpoint via ``convert_openai_clip_state_dict``; randomly
  initialised otherwise);
* any ImageNet CNN from ``care_tpu.models.cnn`` (``resnet18/34/50/101/152``,
  ``inceptionresnetv2``) — the reference wraps the same ``pretrainedmodels``
  CNNs (``models/Backbone.py:27-33``).  Pretrained weights load from a local
  torch state_dict via ``opt['backbone_weights']`` (list of .pth paths per
  modality, '' to skip) through :func:`maybe_load_backbone_weights`.
"""

from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import flax.linen as nn

from care_tpu.pretreatment.clip import CLIPVisionTransformer


_CLIP_VIT_CONFIGS = {
    "ViT-B/32": dict(patch_size=32, width=768, layers=12, heads=12,
                     output_dim=512),
    "ViT-B-32": dict(patch_size=32, width=768, layers=12, heads=12,
                     output_dim=512),
    "ViT-B/16": dict(patch_size=16, width=768, layers=12, heads=12,
                     output_dim=512),
    "ViT-B-16": dict(patch_size=16, width=768, layers=12, heads=12,
                     output_dim=512),
}


class BackboneManager(nn.Module):
    """Applies the image backbone to the 'i' stream, passes others through."""
    opt: Dict[str, Any]

    def setup(self):
        opt = self.opt
        names = [n.strip() for n in opt.get("with_backbones", [])]
        assert len(names) == len(opt["modality"]), \
            (len(names), len(opt["modality"]))
        backbones = []
        for name, char in zip(names, opt["modality"]):
            if char != "i" or not name:
                assert not name or char == "i", \
                    "only the image backbone is supported"
                backbones.append(None)
            elif "clip" in name:
                arch = name.split("~")[1]
                cfg = _CLIP_VIT_CONFIGS.get(arch)
                assert cfg is not None, f"unsupported CLIP arch `{arch}`"
                backbones.append(CLIPVisionTransformer(
                    **cfg, name=f"Backbone_{char.upper()}"))
            else:
                from care_tpu.models.cnn import CNN_SPECS, ResNet, \
                    InceptionResNetV2
                assert name in CNN_SPECS, \
                    f"unsupported backbone `{name}` " \
                    f"(use clip~<arch> or one of {sorted(CNN_SPECS)})"
                if name.startswith("resnet"):
                    backbones.append(ResNet(
                        depth=int(name[6:]), name=f"Backbone_{char.upper()}"))
                else:
                    backbones.append(InceptionResNetV2(
                        name=f"Backbone_{char.upper()}"))
        self.backbones = backbones

    def __call__(self, feats: List[jnp.ndarray]) -> List[jnp.ndarray]:
        outputs = []
        for backbone, f in zip(self.backbones, feats):
            if backbone is None:
                outputs.append(f)
            else:
                bsz, n_frames = f.shape[:2]
                flat = f.reshape((bsz * n_frames,) + f.shape[2:])
                out = backbone(flat)
                outputs.append(out.reshape(bsz, n_frames, -1))
        return outputs


def get_backbone(opt: dict) -> Optional[BackboneManager]:
    if not opt.get("with_backbones", []):
        return None
    return BackboneManager(opt, name="backbone")


def maybe_load_backbone_weights(variables, opt: dict):
    """Overwrite freshly-initialised backbone params with converted local
    torch weights (``opt['backbone_weights']``: one state_dict path per
    modality, '' to keep the init).  The reference downloads ImageNet /
    CLIP weights at construction (``models/Backbone.py:22-33``); zero-egress
    here, so weights must be local files."""
    paths = opt.get("backbone_weights", [])
    names = [n.strip() for n in opt.get("with_backbones", [])]
    if not paths or not names:
        return variables
    import torch
    assert len(paths) == len(names), (len(paths), len(names))
    variables = dict(variables)
    for path, name, char in zip(paths, names, opt["modality"]):
        if not path or not name:
            continue
        sd = torch.load(path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        sd = {k: v.float().numpy() for k, v in sd.items()
              if hasattr(v, "numpy")}
        key = f"Backbone_{char.upper()}"
        if "clip" in name:
            from care_tpu.pretreatment.clip import \
                convert_openai_clip_state_dict
            vision_params, _, _ = convert_openai_clip_state_dict(sd)
            new_cols = {"params": vision_params}
        else:
            from care_tpu.models.cnn import convert_cnn_state_dict
            new_cols = convert_cnn_state_dict(sd, name)
        for col, tree in new_cols.items():
            tgt = dict(variables.get(col, {}))
            bb = dict(tgt.get("backbone", {}))
            assert key in variables["params"].get("backbone", {}), \
                f"backbone scope `{key}` not found in model params"
            bb[key] = tree
            tgt["backbone"] = bb
            variables[col] = tgt
    return variables
