"""Benchmark: DeepFM Criteo training throughput on one TPU chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "examples/s", "vs_baseline": N/3072}

Baseline: the reference's DeepFM trains at 12 global_step/sec × batch 256 on
2× GTX 1080 Ti ≈ 3,072 examples/s (README.md:45, deepfm/readme.md:57-62;
BASELINE.md). The BASELINE.json north star asks for >10,000 examples/s/chip.

Config parity: full Criteo feature space (39 fields, 100k-capped hashed
vocabs), embedding dim 16, DNN 100,100 with BN+dropout, Adam — the README
experiment setup (README.md:32-36) — but at a TPU-right global batch size
(the reference's 256 under-feeds a v5e chip by orders of magnitude; per-epoch
example count, not step count, is the work unit).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from recsys_tpu.core.config import CriteoConfig, ModelConfig
    from recsys_tpu.data import criteo
    from recsys_tpu.models.api import make_model
    from recsys_tpu.train import train_state as TS

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 60

    criteo_cfg = CriteoConfig()
    model = make_model(
        "deepfm", criteo_cfg,
        ModelConfig(embedding_dim=16, deep_layers=(100, 100)),
    )
    ts, tx = TS.create_train_state(model, seed=0, learning_rate=1e-3)
    step_fn = TS.make_train_step(model, tx)

    # Pre-stage a rotation of device-resident batches so host feeding is off
    # the measured path (the input pipeline is benchmarked separately).
    n_rot = 4
    batches = []
    for i in range(n_rot):
        data = criteo.synthetic_criteo(batch_size, criteo_cfg,
                                       start_row=i * batch_size)
        batches.append({k: jnp.asarray(v) for k, v in data.items()})

    # warmup/compile
    for i in range(3):
        ts, loss = step_fn(ts, batches[i % n_rot])
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for i in range(steps):
        ts, loss = step_fn(ts, batches[i % n_rot])
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    ex_per_s = batch_size * steps / dt
    print(json.dumps({
        "metric": "deepfm_criteo_train_examples_per_sec_per_chip",
        "value": round(ex_per_s, 1),
        "unit": "examples/s",
        "vs_baseline": round(ex_per_s / 3072.0, 2),
    }))


if __name__ == "__main__":
    main()
