"""Multi-process bring-up smoke (SURVEY §5.8): two local OS processes join
via jax.distributed.initialize on CPU, shard input files disjointly, and a
jitted global reduction sees both processes' data."""

import json
import os
import socket
import subprocess
import sys

def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_psum_and_file_sharding():
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"

    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "recsys_tpu.tools.mp_smoke",
             f"--coordinator=127.0.0.1:{port}",
             "--num_processes=2", f"--process_id={pid}",
             "--local_devices=2"],
            cwd=repo, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    for rec in outs:
        assert rec["ok"], rec
        assert rec["process_count"] == 2
        assert rec["global_devices"] == 4
        # both processes agree on the global sum: 2*4*1 + 2*4*2 = 24
        assert rec["psum"] == rec["expected"] == 24.0

    # file shards are disjoint and covering
    shard0 = set(outs[0]["file_shard"]) if outs[0]["process_id"] == 0 else set(outs[1]["file_shard"])
    shard1 = set(outs[1]["file_shard"]) if outs[1]["process_id"] == 1 else set(outs[0]["file_shard"])
    assert shard0.isdisjoint(shard1)
    assert shard0 | shard1 == {f"part-{i:02d}" for i in range(7)}
    assert abs(len(shard0) - len(shard1)) <= 1
