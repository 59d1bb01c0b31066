"""Dry-parse every command line in ``scripts/*.sh``.

The reference ships its paper tables as shell grids (reference
``scripts/exp_main_*.sh``, ``exp_ablation_*.sh``, ``retrieval_db_ratio.sh``).
A tiny shell interpreter expands each script's variable assignments and
``for`` loops, collects every ``python train.py`` / ``python translate.py``
command, and validates that it parses through our CLI and (for training
commands) assembles a coherent opt dict via ``get_opt`` — so the full
experiment grid is guaranteed launchable.
"""

import os
import re
import shlex

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# utility scripts that are not part of the reference experiment grid
# (run.sh is the seed-loop launcher the grids call; the tpu_* session
# scripts drive benchmarks, not train/translate grids)
_NON_GRID = {"run.sh", "tpu_round5_session.sh"}
SCRIPTS = sorted(f for f in os.listdir(os.path.join(REPO, "scripts"))
                 if f.endswith(".sh") and f not in _NON_GRID)


def _subst(text: str, env: dict) -> str:
    def repl(m):
        name, default = m.group(1), m.group(2)
        if name.isdigit():
            return env.get(name, default if default is not None else "")
        return env.get(name, default if default is not None else "")
    # ${var:-default} then ${var} then $var
    text = re.sub(r"\$\{(\w+):-([^}]*)\}", repl, text)
    text = re.sub(r"\$\{(\w+)()\}", lambda m: env.get(m.group(1), ""), text)
    text = re.sub(r"\$(\w+)", lambda m: env.get(m.group(1), ""), text)
    return text


def _interpret(lines, env, cmds):
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        if not line or line.startswith("#"):
            i += 1
            continue
        m = re.match(r"^for (\w+) in (.+?);\s*do$", line)
        if m:
            var, values = m.group(1), m.group(2).split()
            depth, j = 1, i + 1
            while depth:
                nxt = lines[j].strip()
                if re.match(r"^for \w+ in ", nxt):
                    depth += 1
                elif nxt == "done":
                    depth -= 1
                if depth:
                    j += 1
            body = lines[i + 1:j]
            for v in values:
                _interpret(body, {**env, var: _subst(v, env)}, cmds)
            i = j + 1
            continue
        m = re.match(r"^(\w+)=(.*)$", line)
        if m:
            val = m.group(2)
            if len(val) >= 2 and val[0] == '"' and val[-1] == '"':
                val = val[1:-1]
            env[m.group(1)] = _subst(val, env)
            i += 1
            continue
        if line.startswith("bash scripts/run.sh"):
            parts = shlex.split(_subst(line, env))
            # run.sh appends per-seed flags; emulate seed 0
            cmds.append(parts[2] + " --seed 0 --devices " +
                        (parts[4] if len(parts) > 4 else "0"))
            i += 1
            continue
        if line.startswith("eval "):
            cmds.append(_subst(line[5:].strip().strip('"'), env))
            i += 1
            continue
        if line.split()[0] in ("echo",):
            i += 1
            continue
        raise AssertionError(f"unhandled script line: {line!r}")
    return cmds


def collect_commands(script: str):
    with open(os.path.join(REPO, "scripts", script)) as f:
        raw = f.read()
    raw = raw.replace("\\\n", " ")
    lines = raw.split("\n")
    # strip the shebang
    lines = [l for l in lines if not l.startswith("#!")]
    return _interpret(lines, {}, [])


@pytest.mark.parametrize("script", SCRIPTS)
def test_script_commands_parse(script):
    import train as train_cli
    import translate as translate_cli
    from care_tpu.config import get_opt
    from care_tpu.config.cli import overrides_from_args

    cmds = collect_commands(script)
    assert cmds, f"{script}: no commands collected"
    for cmd in cmds:
        argv = shlex.split(cmd)
        assert argv[0] == "python", cmd
        if argv[1] == "train.py":
            args = train_cli.parse_args(argv[2:])
            overrides = overrides_from_args(
                args, exclude=("override", "mesh", "devices"))
            opt = get_opt(overrides, read_vocab=False)
            assert opt["checkpoint_path"], cmd
            assert opt["method"], cmd
            # concept-era tasks must have wired the attribute criterion
            if opt.get("attribute_prediction"):
                assert "attribute" in opt["crits"], cmd
        elif argv[1] == "translate.py":
            args = translate_cli.parse_args(argv[2:])
            assert args.checkpoint_paths, cmd
        else:
            raise AssertionError(f"unexpected entry point in {cmd}")


def test_grid_covers_reference_tables():
    """The grid must include the paper's headline configurations."""
    all_cmds = sum((collect_commands(s) for s in SCRIPTS), [])
    joined = "\n".join(all_cmds)
    # main tables: CARE on all three datasets
    for ds in ("MSRVTT", "MSVD", "VATEX"):
        assert re.search(rf"--dataset {ds} .*--task CARE", joined), ds
    # versatility: every grafted method
    for method in ("SALSTM", "TopDown", "NACF", "PointerGen"):
        assert f"--method {method}" in joined, method
    # ablations: GSG/LSG flag grid + modality grid
    for flags in ("G0L0", "G1L0", "G0Lc", "G1Lc", "G1L1"):
        assert f"--use_attr_flags {flags}" in joined, flags
    for pm in ("VAT", "VT", "VA", "V"):
        assert f"--predictor_modality_flags {pm} " in joined \
            or joined.rstrip().endswith(f"--predictor_modality_flags {pm}"), pm
    # robustness sweep
    assert "--retrieval_db_ratio" in joined
