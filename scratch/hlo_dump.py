"""Dump compiled HLO of the fused step; print bodies of the hot fusions."""
import sys, re
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from recsys_tpu.core.config import RunConfig
from recsys_tpu.data import criteo
from recsys_tpu.models.api import make_model
from recsys_tpu.train import fast
from recsys_tpu.train import train_state as TS

K = 10
cfg = RunConfig()
model = make_model("deepfm", cfg.criteo, cfg.model)
ts, tx = TS.create_train_state(model, 0, 1e-3)
n = 65536
data = criteo.synthetic_criteo(n, cfg.criteo)
staged = fast.stage_dataset(data)
step_fn = fast.make_scanned_train_step(model, tx)
rng = np.random.default_rng(0)
idx = jnp.asarray(fast.epoch_index_matrix(n, 8192, K, rng))
txt = step_fn.lower(ts, staged, idx).compile().as_text()
open("/tmp/step.hlo", "w").write(txt)
print("wrote /tmp/step.hlo", len(txt))

for target in ["multiply_add_fusion.84", "fusion.220", "fusion.199",
               "copy.38", "broadcast_select_fusion.5", "sort.27",
               "transpose_jvp___.9"]:
    for line in txt.splitlines():
        if ("%" + target + " ") in line or (" " + target + " =") in line:
            print("\n>>>", line.strip()[:400])
            break
