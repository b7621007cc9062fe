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


def test_results_partial_rerun_patches_existing(tmp_path):
    """--models=subset merges into the existing RESULTS.json: other CTR
    rows and skipped sections survive a partial re-run."""
    out = str(tmp_path / "RESULTS.md")
    jpath = os.path.splitext(out)[0] + ".json"
    main([
        "--models=fm", "--batch=512", "--steps=4", "--rows=4096",
        "--din=0", "--cf=0", "--serving=0", f"--out={out}",
    ])
    # plant a fake section + an extra ctr row to witness the merge
    with open(jpath) as f:
        j = json.load(f)
    j["serving"] = [{"device": "cpu", "protocol": "fake", "batch": 7,
                     "latency_ms_p50": 1.0, "latency_ms_p99": 2.0,
                     "latency_ms_mean": 1.5}]
    j["ctr"].append({"model": "dnn", "auc": 0.5, "logloss": 0.7,
                     "train_examples_per_s": 123.0,
                     "eval_examples_per_s": 456.0})
    with open(jpath, "w") as f:
        json.dump(j, f)

    result = main([
        "--models=fm", "--batch=512", "--steps=4", "--rows=4096",
        "--din=0", "--cf=0", "--serving=0", f"--out={out}",
    ])
    models = [r["model"] for r in result["ctr"]]
    assert "fm" in models and "dnn" in models      # old row kept
    assert result["serving"][0]["protocol"] == "fake"  # old section kept
    md = open(out).read()
    assert "| dnn |" in md and "fake" in md


def test_convergence_json_three_ceiling_structure():
    """The committed CONVERGENCE.json carries the three-ceiling protocol
    with per-model closure, ordered linear < id-only <= full, and the
    closure arithmetic consistent with the recorded ceilings."""
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "CONVERGENCE.json")
    with open(path) as f:
        j = json.load(f)
    lin = j["linear_ceiling"]["auc"]
    ido = j["idonly_ceiling"]["auc"]
    full = j["bayes_ceiling"]["auc"]
    assert lin < ido <= full
    gap = full - lin
    assert gap > 0.01   # the interaction gap is real structure
    models = {r["model"]: r for r in j["models"]}
    for name in ("wide", "fm", "deepfm", "dcn", "xdeepfm", "dnn"):
        r = models[name]
        assert abs(r["closure"] - (r["auc"] - lin) / gap) < 1e-6
    # additive model pinned at the linear ceiling; towers recover most of
    # the interaction structure
    assert abs(models["wide"]["auc"] - lin) < 0.005
    for name in ("fm", "deepfm", "dcn", "xdeepfm", "dnn"):
        assert models[name]["closure"] >= 0.8, (name, models[name])
