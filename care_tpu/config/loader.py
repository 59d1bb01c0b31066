"""Option assembly: defaults -> YAML overlays -> derived keys.

Reproduces the reference's cascading configuration semantics
(``opts.py:260-266`` + ``misc/utils.py:12-59``):

* overlay order: method -> task -> setup -> feats -> arch,
* each YAML entry may recursively ``inherit_from`` one or several siblings,
* the task entry (or an inherited one) may carry a ``scope_format``
  ``[fmt, [key, ...]]`` pair used to template the experiment folder name,
* feature-file *names* are turned into absolute *paths* under
  ``<base_data_path>/<dataset>/{feats|retrieval}/``,
* predictor-contributed argument checks (``models/Predictor/__init__.py:19-23``,
  ``pred_attribute.py:168-210``, ``pred_attribute.py:308-341``,
  ``pred_length.py:31-37``) that map flag strings to modalities and extend
  ``crits``.
"""

import os
import copy
import pickle

import yaml

from care_tpu import constants
from care_tpu.config.defaults import default_opt

_YAML_DIR = os.path.join(os.path.dirname(__file__), "yamls")


def _yaml_path(name: str) -> str:
    return os.path.join(_YAML_DIR, name + ".yaml")


def load_yaml(opt: dict, key, yaml_name: str, modify_scope: bool = False,
              name_to_path: bool = False, yaml_data=None) -> None:
    """Overlay one YAML entry (with recursive inheritance) onto ``opt``."""
    if not key:
        return
    if yaml_data is None:
        with open(_yaml_path(yaml_name)) as f:
            yaml_data = yaml.safe_load(f)
    if key not in yaml_data:
        raise KeyError(f"`{key}` not found in {yaml_name}.yaml")

    entry = dict(yaml_data[key])  # shallow copy; we pop below

    inherit_from = entry.pop("inherit_from", None)
    if inherit_from is not None:
        if not isinstance(inherit_from, list):
            inherit_from = [inherit_from]
        for parent in inherit_from:
            load_yaml(opt, parent, yaml_name, name_to_path=name_to_path,
                      yaml_data=yaml_data)

    new_scope = key
    format_spec = None
    if modify_scope:
        if "scope_format" in entry:
            format_spec = entry.pop("scope_format")
        elif "scope_format" in opt:
            format_spec = opt.pop("scope_format")
    else:
        # keep an inherited scope_format around so a child overlay can use it
        if "scope_format" in entry:
            opt["scope_format"] = entry.pop("scope_format")

    for k, v in entry.items():
        if name_to_path and "name" in k:
            path_k = k.replace("name", "path")
            base = opt.get("base_data_path") or constants.BASE_DATA_PATH
            opt[path_k] = os.path.join(base, opt["dataset"], v)
        else:
            opt[k] = v

    if modify_scope:
        if format_spec is not None:
            fmt, names = format_spec
            values = []
            for name in names:
                v = opt.get(name)
                if isinstance(v, list):
                    v = "-".join(str(item) for item in v)
                values.append(v)
            new_scope = fmt.format(*values)
        opt["scope"] = (new_scope + "_" + opt["scope"]) if opt.get("scope") else new_scope


def check_whether_to_load_weights(opt: dict) -> None:
    """Task-level teacher-weight inheritance (reference
    ``misc/utils.py:62-98``): a task with ``weights_from_inherit: true``
    resolves its parent task's scope to preload ``best.ckpt``."""
    if not opt.get("task"):
        return
    with open(_yaml_path("tasks")) as f:
        yaml_data = yaml.safe_load(f)
    entry = yaml_data.get(opt["task"], {})
    if not entry.get("weights_from_inherit", False):
        return
    assert "inherit_from" in entry, entry.keys()

    def get_scope_format(key):
        if isinstance(key, list):
            key = key[0]
        if "scope_format" in yaml_data[key]:
            return yaml_data[key]["scope_format"]
        return get_scope_format(yaml_data[key]["inherit_from"])

    fmt, names = get_scope_format(entry["inherit_from"])
    values = []
    for name in names:
        v = opt.get(name)
        if isinstance(v, list):
            v = "-".join(str(x) for x in v)
        values.append(v)
    inherit_scope = fmt.format(*values)
    parent = entry["inherit_from"]
    if isinstance(parent, list):
        parent = parent[0]
    opt["load_model_weights_from"] = os.path.join(
        constants.BASE_CHECKPOINT_PATH, opt["dataset"], opt.get("method", ""),
        parent, inherit_scope, "best.ckpt")


def apply_yaml_overlays(opt: dict) -> None:
    """Apply the five-level overlay: method, task, setup, feats, arch."""
    load_yaml(opt, opt.get("method"), "methods")
    check_whether_to_load_weights(opt)
    load_yaml(opt, opt.get("task"), "tasks", modify_scope=True, name_to_path=True)
    load_yaml(opt, opt.get("setup"), "setups")
    load_yaml(opt, opt.get("feats"), "feats")
    load_yaml(opt, opt.get("arch"), "archs")
    opt.pop("scope_format", None)


# ---------------------------------------------------------------------------
# predictor-contributed argument checks
# ---------------------------------------------------------------------------

def _retrieval_arch_mapping(opt: dict) -> dict:
    base = opt.get("base_data_path") or constants.BASE_DATA_PATH
    root = os.path.join(base, opt["dataset"], "retrieval")
    return {
        "ViT": (512, os.path.join(root, "CLIP_ViT-B-32_unique.hdf5")),
        "ViT16": (512, os.path.join(root, "CLIP_ViT-B-16_unique.hdf5")),
        "RN101": (512, os.path.join(root, "CLIP_RN101_unique.hdf5")),
        "RN50": (1024, os.path.join(root, "CLIP_RN50_unique.hdf5")),
        "RN50x4": (640, os.path.join(root, "CLIP_RN50x4_unique.hdf5")),
        "RN50x16": (768, os.path.join(root, "CLIP_RN50x16_unique.hdf5")),
    }


def check_attribute_args(opt: dict) -> None:
    """Concept-detector arg plumbing (reference ``pred_attribute.py:168-210``)."""
    if opt.get("attribute_prediction"):
        crits = opt["crits"]
        if not isinstance(crits, list):
            crits = [crits]
        if "attribute" not in crits:
            crits = crits + ["attribute"]
        opt["crits"] = crits

    arch_mapping = _retrieval_arch_mapping(opt)

    if opt.get("retrieval"):
        assert opt.get("pointer") is not None, \
            "retrieval-based methods require a pointer network"
        opt["modality"] = opt["modality"] + "t"
        opt["dim_t"], opt["feats_t"] = arch_mapping[opt["retrieval_arch"]]

    if opt.get("attribute_prediction"):
        if not any(k in (opt.get("task") or "") for k in ["VAP", "TAP", "DAP"]):
            assert opt.get("decoder_modality_flags"), \
                "please specify decoder_modality_flags instead of modality"
            assert opt.get("predictor_modality_flags"), \
                "please specify predictor_modality_flags instead of modality"
            opt["modality_for_decoder"] = constants.FLAG2MODALITY[opt["decoder_modality_flags"]]
            opt["modality_for_predictor"] = constants.FLAG2MODALITY[opt["predictor_modality_flags"]]
            union = opt["modality_for_decoder"] + opt["modality_for_predictor"]
            opt["modality"] = "".join(c for c in "amir" if c in union)

        if opt.get("pointer"):
            opt["modality"] = opt["modality"] + "t"

        if "r" in opt["modality"]:
            opt["dim_r"], opt["feats_r"] = arch_mapping[opt["retrieval_arch"]]


def check_semantic_container_args(opt: dict) -> None:
    """G-LSG flag mapping (reference ``pred_attribute.py:308-341``)."""
    if not opt.get("use_attr_type") and opt.get("use_attr_flags") == "G0L0":
        opt["use_attr"] = False

    if opt.get("use_attr"):
        assert opt.get("attribute_prediction"), \
            "`attribute_prediction` must be on to use predicted concepts"
        if not opt.get("use_attr_type"):
            mapping = {"G0": "", "G1": "emb", "Gp": "pp_emb",
                       "L0": "", "L1": "att", "Lc": "concat"}
            flags = opt["use_attr_flags"]
            assert len(flags) == 4, flags
            opt["use_attr_type"] = mapping[flags[:2]] + "_" + mapping[flags[2:]]

        to_add = opt.get("predictors_to_be_added", [])
        if not isinstance(to_add, list):
            to_add = [to_add]
        if "SemanticContainer" not in to_add:
            to_add = to_add + ["SemanticContainer"]
        opt["predictors_to_be_added"] = to_add


def check_length_args(opt: dict) -> None:
    if opt.get("length_prediction"):
        crits = opt["crits"]
        if not isinstance(crits, list):
            crits = [crits]
        if "length" not in crits:
            crits = crits + ["length"]
        opt["crits"] = crits


def check_predictor_args(opt: dict) -> None:
    check_attribute_args(opt)
    check_semantic_container_args(opt)
    check_length_args(opt)


# ---------------------------------------------------------------------------
# top-level assembly
# ---------------------------------------------------------------------------

def get_opt(overrides: dict = None, resolve_paths: bool = True,
            read_vocab: bool = True) -> dict:
    """Assemble the full option dict.

    ``overrides`` play the role of CLI arguments (applied before the YAML
    overlays, exactly like argparse values in the reference). Set
    ``resolve_paths=False`` / ``read_vocab=False`` for synthetic-data runs
    where no corpus exists on disk (``vocab_size`` must then be supplied via
    ``overrides``).
    """
    opt = default_opt()
    if overrides:
        opt.update(copy.deepcopy(overrides))

    apply_yaml_overlays(opt)
    # CLI values win over YAML for explicitly overridden keys? No: reference
    # argparse values are *defaults* that YAML overlays overwrite; explicit
    # post-YAML overrides can be passed via `final_overrides` key.
    final = opt.pop("final_overrides", None)
    if final:
        opt.update(final)

    if opt["dataset"] in ("MSVD", "VATEX") and opt.get("with_category"):
        opt["with_category"] = False

    # experiment folder
    opt["checkpoint_path"] = os.path.join(
        constants.BASE_CHECKPOINT_PATH, opt["dataset"], opt.get("method") or "",
        opt.get("task") or "", opt.get("scope") or "")

    # NACF teacher path inference (reference ``opts.py:311-324``): the AR-B
    # teacher checkpoint lives in the parallel ARB experiment folder
    if (opt.get("decoding_type") == "NARFormer"
            and opt.get("with_teacher_during_training")):
        if not opt.get("teacher_path"):
            if "NACF" in opt["checkpoint_path"]:
                opt["teacher_path"] = os.path.join(
                    opt["checkpoint_path"].replace("NACF", "ARB"),
                    "best.ckpt")
        if opt.get("load_teacher_weights") and opt.get("teacher_path"):
            opt["load_model_weights_from"] = opt["teacher_path"]
            opt["load_strictly"] = False

    if resolve_paths:
        base = opt.get("base_data_path") or constants.BASE_DATA_PATH

        def to_dir(mid_path, value):
            if not value:
                return ""
            if isinstance(value, list):
                return [to_dir(mid_path, v) for v in value]
            return os.path.join(base, opt["dataset"], mid_path, value)

        for key in ["feats_a_name", "feats_m_name", "feats_i_name",
                    "feats_o_name", "feats_t_name", "feats_r_name",
                    "reference_name", "info_corpus_name"]:
            mid = "retrieval" if key == "feats_r_name" else ("feats" if "feats" in key else "")
            if key == "info_corpus_name" and opt.get("distilled_info_corpus_name"):
                # NAR distillation corpus swap (reference opts.py:337-342)
                assert opt["decoding_type"] == "NARFormer"
                opt["info_corpus"] = to_dir(
                    mid, opt.pop("distilled_info_corpus_name"))
                opt.pop(key, None)
                continue
            opt[key[:-5]] = to_dir(mid, opt.get(key, ""))
            opt.pop(key, None)

        if read_vocab and opt.get("info_corpus") and os.path.exists(opt["info_corpus"]):
            with open(opt["info_corpus"], "rb") as f:
                opt["vocab_size"] = len(pickle.load(f)["info"]["itow"])

    check_predictor_args(opt)
    return opt
