"""Multi-chip train_and_evaluate driver (the SPMD product path).

The reference's default training mode is estimator ``train_and_evaluate``
UNDER distribution (``MirroredStrategy`` applied to both train and eval,
deepfm/deepfm.py:159-210); this is its mesh-parallel equivalent: the batch
is split over the 'data' axis, embedding tables row-shard over 'model'
(dedup + all-to-all lookup), the scan-fused SPMD step fuses K optimizer
steps per dispatch, eval streams the same AUC/logloss metrics, and
checkpoints + JSONL scalars land in ``model_dir`` exactly like the
single-chip drivers — resume included.

Reachable from the CLI: ``python -m recsys_tpu.tools.train_ctr train
--mesh.model_axis=2 ...`` (tools/train_ctr.py picks this driver whenever
the mesh spans more than one device).
"""

from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from recsys_tpu.core.checkpoint import CheckpointManager
from recsys_tpu.core.config import MeshConfig, TrainConfig
from recsys_tpu.core.mesh import DATA_AXIS, MeshEnv, make_mesh
from recsys_tpu.models.api import Model
from recsys_tpu.parallel import spmd
from recsys_tpu.train import metrics as M
from recsys_tpu.train import optim
from recsys_tpu.train.summaries import ScalarWriter

log = logging.getLogger("recsys_tpu")


def _stack_batches(data: dict[str, np.ndarray], idx: np.ndarray) -> dict:
    """[K, B] row indices → stacked host batch pytree [K, B, ...]."""
    return {k: v[idx] for k, v in data.items()}


def train_and_evaluate_spmd(
    model: Model,
    train_data: dict[str, np.ndarray],
    eval_data: dict[str, np.ndarray],
    cfg: TrainConfig,
    mesh_cfg: MeshConfig = MeshConfig(),
    *,
    num_steps: int,
    steps_per_call: int = 10,
    env: MeshEnv | None = None,
    resume: bool = True,
    a2a_exact: bool = False,
) -> dict[str, float]:
    """Train over the ('data','model') mesh with periodic eval + ckpt.

    Semantics match `loop.train_and_evaluate_fast` (with-replacement batch
    sampling, streaming eval metrics, keep-k + best-AUC checkpoints); only
    the placement differs: batches shard over 'data', tables over 'model'.
    """
    env = env if env is not None else make_mesh(mesh_cfg)
    opt = optim.for_model(model.meta, cfg.learning_rate)
    ckpt = CheckpointManager(cfg.model_dir, cfg.keep_checkpoint_max)

    init_key, run_key = jax.random.split(jax.random.key(cfg.seed))
    params, mstate = model.init(init_key)
    opt_state = opt.init(params)
    start_step = 0
    if resume:
        restored = ckpt.restore((params, mstate, opt_state))
        if restored is not None:
            (params, mstate, opt_state), start_step, _ = restored
            log.info("resumed from step %d", start_step)

    pspecs = spmd.param_specs(params)
    state = spmd.SpmdState(
        params=spmd.place(params, pspecs, env),
        model_state=spmd.place(
            mstate, jax.tree.map(lambda _: spmd.P(), mstate), env),
        opt_state=spmd.place(opt_state, spmd.opt_specs(pspecs, opt_state),
                             env),
        step=jnp.asarray(start_step, jnp.int32),
        rng=run_key,
    )

    n_train = len(train_data["label"])
    n_eval = len(eval_data["label"])
    bs = cfg.batch_size
    if bs % env.num_data != 0:
        raise ValueError(
            f"batch_size {bs} not divisible by data axis {env.num_data}")

    rng = np.random.default_rng(cfg.seed)
    example_idx = rng.integers(0, n_train, size=(steps_per_call, bs))
    example_stack = _stack_batches(train_data, example_idx)
    step_fn = spmd.make_spmd_train_step_scanned(
        model, opt, env, example_stack, a2a_exact=a2a_exact)

    eval_bs = min(bs, n_eval)
    eval_example = {k: v[:eval_bs] for k, v in eval_data.items()}
    eval_logits_fn = spmd.make_spmd_eval_logits(model, env, eval_example,
                                                a2a_exact=a2a_exact)
    metric_update = jax.jit(M.update_binary_metrics)

    def run_eval(st: spmd.SpmdState) -> dict[str, float]:
        n_batches = min(cfg.eval_steps, max(1, n_eval // eval_bs))
        mstate_m = M.init_binary_metrics()
        for i in range(n_batches):
            hb = {k: v[i * eval_bs:(i + 1) * eval_bs] for k, v in
                  eval_data.items()}
            batch = spmd.place(hb, spmd.batch_specs(hb), env)
            logits = eval_logits_fn(st.params, st.model_state, batch)
            mstate_m = metric_update(mstate_m, logits, batch["label"])
        return M.finalize_binary_metrics(mstate_m)

    writer = ScalarWriter(cfg.model_dir)
    t0 = time.time()
    window_t0, window_steps = t0, start_step
    done = start_step
    last_metrics: dict[str, float] = {}
    loss_v = float("nan")
    next_eval = ((done // cfg.eval_every_steps) + 1) * cfg.eval_every_steps
    stack_specs = jax.tree.map(
        lambda v: spmd.P(None, DATA_AXIS, *([None] * (v.ndim - 2))),
        example_stack)
    while done < num_steps:
        k = min(steps_per_call, num_steps - done, max(1, next_eval - done))
        idx = rng.integers(0, n_train, size=(k, bs))
        stack = spmd.place(_stack_batches(train_data, idx), stack_specs, env)
        state, loss = step_fn(state, stack)
        done += k
        if done >= next_eval or done >= num_steps:
            loss_v = float(loss)
            now = time.time()
            rate = (done - window_steps) / max(now - window_t0, 1e-9)
            log.info("spmd step %d loss %.5f  %.1f steps/s  %.0f ex/s "
                     "(mesh %dx%d)", done, loss_v, rate, rate * bs,
                     env.num_data, env.num_model)
            window_t0, window_steps = now, done
            last_metrics = run_eval(state)
            log.info("eval @ step %d: auc %.5f logloss %.5f acc %.5f",
                     done, last_metrics["auc"], last_metrics["logloss"],
                     last_metrics["accuracy"])
            writer.write(done, loss=loss_v, examples_per_sec=rate * bs,
                         eval_auc=last_metrics["auc"],
                         eval_logloss=last_metrics["logloss"])
            ckpt.save(
                done,
                (jax.device_get(state.params),
                 jax.device_get(state.model_state),
                 jax.device_get(state.opt_state)),
                metric=last_metrics.get("auc"),
            )
            next_eval += cfg.eval_every_steps
    writer.close()

    last_metrics["train_seconds"] = time.time() - t0
    last_metrics["final_loss"] = loss_v
    return last_metrics
