"""eval_json.py CLI: score a saved predictions JSON against refs.pkl
(reference ``eval_json.py:9-27``)."""

import json
import os
import pickle
import subprocess

from helpers import cpu_subprocess_env
import sys


def test_eval_json_cli(tmp_path):
    refs = {"video0": [{"caption": "a man is running"},
                       {"caption": "a man runs"}],
            "video1": [{"caption": "a dog is barking"}]}
    preds = {"video0": [{"caption": "a man is running"}],
             "video1": "a dog barks"}  # both accepted shapes
    ref_path = tmp_path / "refs.pkl"
    with open(ref_path, "wb") as f:
        pickle.dump(refs, f)
    json_path = tmp_path / "preds.json"
    json_path.write_text(json.dumps(preds))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "eval_json.py", "-json", str(json_path),
         "-ref", str(ref_path)],
        cwd=repo, env=cpu_subprocess_env(), capture_output=True, text=True, timeout=200)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = dict(l.split(": ") for l in r.stdout.strip().splitlines()
                 if ": " in l)
    assert float(lines["Bleu_1"]) > 0.5   # one exact-match caption
    assert "CIDEr" in lines and "METEOR" in lines and "ROUGE_L" in lines
