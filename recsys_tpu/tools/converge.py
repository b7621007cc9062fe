"""Convergence-quality protocol: train the CTR zoo to the planted ceiling.

The reference's correctness claim is metric parity on real Criteo
(README.md:20-28 — e.g. FM hits its paper AUC exactly). This repo's quality
claim is the analog on the planted synthetic task: train until the gap to
the task's *attainable* ceiling is small, proving the models and training
stack converge — not just that they're fast.

Protocol (per model):
- one-pass online SGD on FRESH samples drawn on device every step
  (data/synthetic_device.make_device_sampler fused into the training scan)
  — the infinite-data regime: no epoch reuse, no overfitting, the
  optimization target IS the population risk;
- Adam with linear warmup + cosine decay to 0 over the example budget
  (the final AUC millipoints come from shrinking the Adam noise ball);
- dropout off by default (it regularizes against overfitting that cannot
  happen with fresh samples; the 1-epoch RESULTS protocol keeps the
  reference's 0.5);
- eval on a held-out host-generated slice (start_row=1e9) scored against
  BOTH ceilings: the full Bayes ceiling (criteo.synthetic_bayes_metrics)
  and the id-only ceiling (synthetic_device.idonly_bayes_metrics) — the
  best possible for models that never see the raw `dense` values (all but
  xDeepFM, whose linear branch consumes them, xdeepfm/xdeepfm.py:82).

Writes CONVERGENCE.md + CONVERGENCE.json at the repo root.

Usage:
    python -m recsys_tpu.tools.converge [--models=deepfm,dcn,...]
        [--examples=200000000] [--batch=16384] [--lr=0.003]
        [--eval_rows=1048576] [--dropout=0.0] [--out=CONVERGENCE.md]
"""

from __future__ import annotations

import json
import logging
import os
import subprocess
import sys
import time

import numpy as np

log = logging.getLogger("recsys_tpu.converge")

DEFAULT_MODELS = ("fm", "deepfm", "dcn", "xdeepfm", "dnn")
EVAL_START_ROW = 1_000_000_000   # disjoint from every RESULTS/test slice

#: per-model peak lr at batch 16384 (swept on v5e @ 50M examples:
#: deepfm 1.5e-3→0.8535, 3e-3→0.8567, 6e-3→0.8573; xdeepfm 3e-3→0.8590,
#: 6e-3→0.8597 — 6e-3 best and stable for every model)
PEAK_LR = {"fm": 6e-3, "deepfm": 6e-3, "dcn": 6e-3, "xdeepfm": 6e-3,
           "dnn": 6e-3}


def _sync(x) -> float:
    return float(np.asarray(x).ravel()[0])


def converge_ctr(name: str, *, examples: int, batch: int,
                 lr: float | None = None, dropout: float = 0.0,
                 eval_rows: int = 1 << 20, seed: int = 0,
                 log_every_calls: int = 20,
                 eval_data: dict | None = None) -> dict:
    """Train ``name`` on ``examples`` fresh device-sampled rows, cosine lr
    decay to 0; return final eval quality + protocol metadata."""
    import jax
    import jax.numpy as jnp

    from recsys_tpu.core.config import CriteoConfig, ModelConfig
    from recsys_tpu.data import criteo, synthetic_device as sd
    from recsys_tpu.models.api import make_model
    from recsys_tpu.train import fast, metrics as M, optim, train_state as TS

    criteo_cfg = CriteoConfig()
    model_cfg = ModelConfig(name=name, dropout=dropout)
    model = make_model(name, criteo_cfg, model_cfg)

    # steps per dispatch; total rounds UP to a multiple so every call has
    # the same static k (a second k value would recompile the fused scan —
    # ~5 min on a tunneled chip)
    k = 200
    total_steps = -(-examples // (batch * k)) * k
    peak = lr if lr is not None else PEAK_LR.get(name, 3e-3)
    warmup = max(200, total_steps // 50)
    schedule = optim.cosine_decay(peak, total_steps, warmup_steps=warmup)
    ts, tx = TS.create_train_state(model, seed=seed, learning_rate=peak,
                                  opt=optim.adam(schedule))

    sampler = sd.make_device_sampler(criteo_cfg)
    tables = {k: jnp.asarray(v)
              for k, v in sd.planted_tables(criteo_cfg).items()}
    step_fn = fast.make_scanned_train_step_sampler(model, tx, sampler, batch)

    if eval_data is None:
        eval_data = criteo.synthetic_criteo(eval_rows, criteo_cfg,
                                            start_row=EVAL_START_ROW)
    staged_eval = fast.stage_dataset(eval_data)
    eval_fn = fast.make_scanned_eval(model)
    ebs = min(batch, eval_rows)
    n_eb = eval_rows // ebs
    eval_idx = jnp.asarray(
        np.arange(n_eb * ebs).reshape(n_eb, ebs), jnp.int32)

    def run_eval(ts):
        mstate = eval_fn(ts.params, ts.model_state, staged_eval, eval_idx,
                         M.init_binary_metrics())
        return M.finalize_binary_metrics(mstate)

    log.info("%s: compiling fused sample+train scan (k=%d) ...", name, k)
    tc = time.perf_counter()
    step_fn.lower(ts, tables, k).compile()   # AOT: keep compile out of ex/s
    compile_s = time.perf_counter() - tc
    log.info("%s: compiled in %.0f s", name, compile_s)

    done = 0
    calls = 0
    t0 = time.perf_counter()
    loss = None
    while done < total_steps:
        ts, loss = step_fn(ts, tables, k)
        done += k
        calls += 1
        if calls % log_every_calls == 0:
            l = _sync(loss)
            dt = time.perf_counter() - t0
            log.info("%s step %d/%d loss %.5f  %.0f ex/s", name, done,
                     total_steps, l, done * batch / dt)
    final_loss = _sync(loss) if loss is not None else float("nan")
    train_dt = time.perf_counter() - t0

    quality = run_eval(ts)
    out = {
        "model": name, "auc": quality["auc"], "logloss": quality["logloss"],
        "examples": done * batch, "batch": batch, "peak_lr": peak,
        "warmup_steps": warmup, "dropout": dropout,
        "final_loss": final_loss, "train_seconds": round(train_dt, 1),
        "compile_seconds": round(compile_s, 1),
        "train_examples_per_s": round(done * batch / train_dt),
        "eval_rows": eval_rows,
    }
    log.info("%s FINAL: auc %.4f logloss %.4f (%.0f s, %.0f ex/s)", name,
             quality["auc"], quality["logloss"], train_dt,
             out["train_examples_per_s"])
    return out


def main(argv: list[str]) -> None:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    kv = dict(a.lstrip("-").split("=", 1) for a in argv if "=" in a)
    models = tuple(kv.get("models", ",".join(DEFAULT_MODELS)).split(","))
    examples = int(float(kv.get("examples", 2e8)))
    batch = int(kv.get("batch", 16384))
    lr = float(kv["lr"]) if "lr" in kv else None
    dropout = float(kv.get("dropout", 0.0))
    eval_rows = int(float(kv.get("eval_rows", 1 << 20)))
    out_path = kv.get("out", "CONVERGENCE.md")

    from recsys_tpu.core.config import CriteoConfig
    from recsys_tpu.data import criteo, synthetic_device as sd

    cfg = CriteoConfig()
    try:
        commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                                capture_output=True, text=True).stdout.strip()
    except Exception:
        commit = "?"

    log.info("generating %d-row eval slice + ceilings ...", eval_rows)
    eval_data = criteo.synthetic_criteo(eval_rows, cfg,
                                        start_row=EVAL_START_ROW)
    ceiling = criteo.synthetic_bayes_metrics(eval_rows, cfg,
                                             start_row=EVAL_START_ROW)
    idonly = sd.idonly_bayes_metrics(eval_rows, cfg,
                                     start_row=EVAL_START_ROW)
    log.info("bayes ceiling auc %.4f ll %.4f | id-only auc %.4f ll %.4f",
             ceiling["auc"], ceiling["logloss"], idonly["auc"],
             idonly["logloss"])

    rows = []
    for name in models:
        rows.append(converge_ctr(name, examples=examples, batch=batch,
                                 lr=lr, dropout=dropout,
                                 eval_rows=eval_rows, eval_data=eval_data))

    result = {
        "commit": commit, "examples": examples, "batch": batch,
        "eval_rows": eval_rows, "eval_start_row": EVAL_START_ROW,
        "bayes_ceiling": ceiling, "idonly_ceiling": idonly,
        "models": rows,
    }
    with open(os.path.splitext(out_path)[0] + ".json", "w") as f:
        json.dump(result, f, indent=1)

    # dense-consuming models target the full ceiling; id-only models the
    # id-only one (see module docstring)
    sees_dense = {"xdeepfm"}
    lines = [
        "# CONVERGENCE — trained quality vs the planted ceiling",
        "",
        f"Generated by `python -m recsys_tpu.tools.converge` at commit "
        f"`{commit}` "
        f"({time.strftime('%Y-%m-%d %H:%M UTC', time.gmtime())}).",
        "",
        f"Protocol: one-pass online Adam on **{examples:,} fresh rows** of "
        f"the planted synthetic-Criteo distribution, sampled on device every "
        f"step (`data/synthetic_device.py`), batch {batch}, linear warmup + "
        "cosine lr decay to 0, dropout "
        f"{dropout}. Eval on a held-out {eval_rows:,}-row slice "
        f"(start_row={EVAL_START_ROW:,}).",
        "",
        f"Ceilings on this slice — **Bayes (full): AUC "
        f"{ceiling['auc']:.4f} / logloss {ceiling['logloss']:.4f}**; "
        f"**id-only: AUC {idonly['auc']:.4f} / logloss "
        f"{idonly['logloss']:.4f}** (the dense term is independent noise "
        "for models that consume only the 39 ids — every zoo model except "
        "xDeepFM, whose linear branch reads the raw log-scaled continuous "
        "values, xdeepfm/xdeepfm.py:82).",
        "",
        "| model | AUC | logloss | ceiling | gap (AUC) | gap (logloss) | "
        "peak lr | ex/s | train s |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        ceil = ceiling if r["model"] in sees_dense else idonly
        which = "bayes" if r["model"] in sees_dense else "id-only"
        lines.append(
            f"| {r['model']} | {r['auc']:.4f} | {r['logloss']:.4f} "
            f"| {which} | {ceil['auc'] - r['auc']:+.4f} "
            f"| {r['logloss'] - ceil['logloss']:+.4f} "
            f"| {r['peak_lr']:g} | {r['train_examples_per_s']:,} "
            f"| {r['train_seconds']:.0f} |")
    lines += [
        "",
        "Gap (AUC) = attainable ceiling − trained AUC (smaller is better; "
        "negative would be eval-slice noise). Gap (logloss) = trained − "
        "ceiling.",
        "",
    ]
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    log.info("wrote %s", out_path)


if __name__ == "__main__":
    main(sys.argv[1:])
