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

    # 16384 amortizes the per-step fixed costs (table-size-bound work like
    # the Adam stream and the scatter's per-tile items): measured sweep on
    # the W-major layout — 8192 ~1.9M, 16384 2.59M (best), 32768 2.32M
    # ex/s. Larger batches lose to the batch-linear gather/activation
    # traffic growing past the fixed-cost amortization.
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    # 200 steps is plenty for a steady-state rate (~5s of device time at
    # batch 8192); keeping the default short bounds total wall time by the
    # tunnel compile, not the measurement.
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    from recsys_tpu.train import fast

    criteo_cfg = CriteoConfig()
    model = make_model(
        "deepfm", criteo_cfg,
        ModelConfig(embedding_dim=16, deep_layers=(100, 100)),
    )
    ts, tx = TS.create_train_state(model, seed=0, learning_rate=1e-3)

    # Device-resident dataset + scan-fused steps — the framework's real
    # training fast path (recsys_tpu.train.fast devgen, the same step
    # function loop.train_and_evaluate_fast drives): per-step batches are
    # device-side gathers, K steps fuse into one XLA program.
    data = criteo.synthetic_criteo(max(4 * batch_size, 65536), criteo_cfg)
    staged = fast.stage_dataset(data)
    n = len(data["label"])
    k = 50
    # Batch indices are generated ON DEVICE (recsys_tpu.train.fast devgen
    # path): the steady-state loop moves zero bytes host→device, so the
    # measurement reflects chip throughput, not tunnel bandwidth.
    step_fn = fast.make_scanned_train_step_devgen(model, tx, n, batch_size)

    # warmup/compile. NOTE: sync by fetching the loss VALUE — on remote
    # (tunneled) devices block_until_ready can return before device work
    # finishes; a host value fetch is the only hard sync.
    ts, loss = step_fn(ts, staged, k)
    float(loss)

    t0 = time.perf_counter()
    calls = max(1, -(-steps // k))   # ceil: honor the requested step count
    for _ in range(calls):
        ts, loss = step_fn(ts, staged, k)
    final_loss = float(loss)  # hard sync: the chain of donated states
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)

    ex_per_s = batch_size * k * calls / dt
    print(json.dumps({
        "metric": "deepfm_criteo_train_examples_per_sec_per_chip",
        "value": round(ex_per_s, 1),
        "unit": "examples/s",
        "vs_baseline": round(ex_per_s / 3072.0, 2),
    }))


if __name__ == "__main__":
    main()
