"""Device-only profile of one fused DeepFM train call (K steps)."""
import sys, glob, gzip, json, collections
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from recsys_tpu.core.config import RunConfig
from recsys_tpu.data import criteo
from recsys_tpu.models.api import make_model
from recsys_tpu.train import fast
from recsys_tpu.train import train_state as TS
from recsys_tpu.utils import profiling

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
ts, loss = step_fn(ts, staged, idx)
print("warm loss", float(loss), flush=True)

trace_dir = profiling.trace_step(lambda: step_fn(ts, staged, idx)[1])
paths = glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz")
with gzip.open(sorted(paths)[-1]) as f:
    trace = json.load(f)

# identify device pids
pid_name = {}
for e in trace["traceEvents"]:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_name[e["pid"]] = e["args"].get("name", "")
dev_pids = {p for p, nm in pid_name.items() if "TPU" in nm or "device" in nm.lower()}
print("processes:", sorted(set(pid_name.values())), flush=True)

dur = collections.Counter(); cnt = collections.Counter()
for e in trace["traceEvents"]:
    if e.get("ph") == "X" and "dur" in e and e.get("pid") in dev_pids:
        dur[e["name"]] += e["dur"]; cnt[e["name"]] += 1
tot = sum(dur.values())
print(f"total device time {tot/1e3:.2f} ms over {K} steps -> {tot/1e3/K:.3f} ms/step")
for name, d in dur.most_common(30):
    print(f"{d/1e3:9.3f} ms x{cnt[name]:4d}  {name[:90]}")
