"""Persistent training scalars (the RunConfig summary stream).

Replaces the reference's TensorBoard summary cadence
(``RunConfig(save_summary_steps=200)`` — deepfm/deepfm.py:166-167 — and
VAE-CF's explicit ``tf.summary`` scalars, vae-cf/vae_cf_train_val.py:129-144)
with an append-only JSONL stream under ``model_dir``: one record per event,
``{"step": N, "wall_time": t, "<tag>": value, ...}``. JSONL keeps the writer
dependency-free and the stream greppable/pandas-loadable; `read_scalars`
loads it back (used by tests and tools/results.py).
"""

from __future__ import annotations

import json
import os
import time


class ScalarWriter:
    """Append-only JSONL scalar stream, flushed per event."""

    def __init__(self, model_dir: str, filename: str = "scalars.jsonl"):
        os.makedirs(model_dir, exist_ok=True)
        self.path = os.path.join(model_dir, filename)
        self._f = open(self.path, "a")

    def write(self, step: int, **scalars) -> None:
        rec = {"step": int(step), "wall_time": time.time()}
        for k, v in scalars.items():
            rec[k] = float(v)
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_scalars(model_dir: str, filename: str = "scalars.jsonl") -> list[dict]:
    path = os.path.join(model_dir, filename)
    if not os.path.exists(path):
        return []
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out
