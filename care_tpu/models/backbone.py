"""In-model visual backbones for end-to-end training/inference.

Parity target: reference ``models/Backbone.py`` — an optional per-modality
backbone (only the image stream is supported) that encodes raw frames
``[B, n_frames, H, W, 3]`` into features inside the captioner, so
feature-extraction and captioning fuse into one XLA program.

Backbone registry:
* ``clip~ViT-B/32`` (and other ViT variants): the flax CLIP visual tower
  from ``care_tpu.pretreatment.clip`` (weights converted from a local
  OpenAI checkpoint via ``convert_openai_clip_state_dict``; randomly
  initialised otherwise).
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
                raise ValueError(
                    f"unsupported backbone `{name}` (use clip~<arch>)")
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
