"""Multi-chip product path: the SPMD train_and_evaluate driver and its CLI
entry must train on the virtual mesh to the same AUC floor as single-chip
(the reference's default mode is train_and_evaluate UNDER distribution,
deepfm/deepfm.py:159-210)."""

import os

import numpy as np

from recsys_tpu.core.config import CriteoConfig, MeshConfig, ModelConfig, TrainConfig
from recsys_tpu.data import criteo
from recsys_tpu.models.api import make_model
from recsys_tpu.train import spmd_loop
from recsys_tpu.train.summaries import read_scalars

SMALL = CriteoConfig(cat_vocabs=tuple([80] * 26))


def test_spmd_driver_learns_and_persists(tmp_path):
    model = make_model("deepfm", SMALL,
                       ModelConfig(embedding_dim=8, deep_layers=(16, 8)))
    cfg = TrainConfig(batch_size=256, learning_rate=0.005,
                      model_dir=str(tmp_path / "m"),
                      eval_every_steps=100, eval_steps=8)
    train_data = criteo.synthetic_criteo(30_000, SMALL)
    eval_data = criteo.synthetic_criteo(4_096, SMALL, start_row=500_000)
    metrics = spmd_loop.train_and_evaluate_spmd(
        model, train_data, eval_data, cfg, MeshConfig(model_axis=2),
        num_steps=200,
    )
    assert metrics["auc"] > 0.58, metrics

    # JSONL scalars landed in model_dir
    scalars = read_scalars(cfg.model_dir)
    assert scalars and scalars[-1]["step"] == 200
    assert "eval_auc" in scalars[-1] and "loss" in scalars[-1]

    # checkpoints landed and resume does zero extra steps
    assert os.path.exists(os.path.join(cfg.model_dir, "step_200"))
    m2 = spmd_loop.train_and_evaluate_spmd(
        model, train_data, eval_data, cfg, MeshConfig(model_axis=2),
        num_steps=200,
    )
    assert "final_loss" in m2


def test_cli_spmd_mesh(tmp_path, monkeypatch):
    """train_ctr CLI with --mesh.model_axis=2 routes through the SPMD driver
    on the 8-device virtual mesh and reaches the AUC floor."""
    monkeypatch.chdir(tmp_path)
    from recsys_tpu.tools import train_ctr

    metrics = train_ctr.main([
        "train",
        "--mesh.model_axis=2",
        "--model.name=deepfm",
        "--model.embedding_dim=8",
        "--model.deep_layers=16,8",
        "--train.batch_size=256",
        "--train.num_steps=200",
        "--train.eval_every_steps=100",
        "--train.eval_steps=8",
        "--train.learning_rate=0.005",
        f"--train.model_dir={tmp_path / 'm'}",
        "--synthetic_rows=30000",
    ])
    assert metrics["auc"] > 0.58, metrics


def test_spmd_driver_ftrl_wide(tmp_path):
    """The wide model trains under the SPMD driver with its FTRL optimizer
    (reference LinearClassifier parity, deep&wide/deep&wide.py:146-149)."""
    model = make_model("wide", SMALL, ModelConfig(embedding_dim=8))
    assert model.meta.get("optimizer") == "ftrl"
    cfg = TrainConfig(batch_size=256, learning_rate=0.5,
                      model_dir=str(tmp_path / "m"),
                      eval_every_steps=100, eval_steps=8)
    train_data = criteo.synthetic_criteo(20_000, SMALL)
    eval_data = criteo.synthetic_criteo(2_048, SMALL, start_row=500_000)
    metrics = spmd_loop.train_and_evaluate_spmd(
        model, train_data, eval_data, cfg, MeshConfig(model_axis=2),
        num_steps=150,
    )
    assert np.isfinite(metrics["final_loss"])
    assert metrics["auc"] > 0.55, metrics
