from care_tpu.models.framework import Captioner, build_captioner

__all__ = ["Captioner", "build_captioner"]
