"""RESULTS generator regression: tiny run produces well-formed MD + JSON."""

import json
import os

from recsys_tpu.tools.results import main


def test_results_generator_tiny(tmp_path):
    out = str(tmp_path / "RESULTS.md")
    result = main([
        "--models=fm", "--batch=512", "--steps=4", "--rows=4096",
        "--din=0", "--cf=0", "--serving=0", f"--out={out}",
    ])
    assert result["ctr"][0]["model"] == "fm"
    assert result["ctr"][0]["train_examples_per_s"] > 0
    assert 0.0 <= result["ctr"][0]["auc"] <= 1.0

    md = open(out).read()
    assert "| fm |" in md
    assert "train ex/s/chip" in md
    with open(os.path.splitext(out)[0] + ".json") as f:
        j = json.load(f)
    assert j["ctr"][0]["model"] == "fm"
