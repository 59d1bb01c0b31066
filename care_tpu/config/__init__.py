from care_tpu.config.defaults import default_opt
from care_tpu.config.loader import get_opt, load_yaml, apply_yaml_overlays

__all__ = ["default_opt", "get_opt", "load_yaml", "apply_yaml_overlays"]
