"""Multi-host distributed metrics: a real 2-process ``jax.distributed``
run on CPU, each process holding half the validation stream; the
``compute(multihost=True)`` all-reduce must reproduce the single-process
union metrics (the reference's DDP ``idist.all_reduce`` semantics,
reference aimnet/train/metrics.py:146-152 — exercised across actual
processes, not just mesh axes)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

WORKER = r"""
import json, os, sys
import numpy as np
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]),
)
sys.path.insert(0, sys.argv[3])
from aimnetcentral_tpu.train.metrics import MetricConfig, RegMultiMetric

rank = jax.process_index()
rng = np.random.default_rng(42)
pred = rng.normal(size=(32,)).astype(np.float32)
true = rng.normal(size=(32,)).astype(np.float32)
half = slice(0, 16) if rank == 0 else slice(16, 32)

m = RegMultiMetric([MetricConfig(key_pred="e", key_true="e")])
m.update({"e": pred[half]}, {"e": true[half]})
out = m.compute(multihost=True)
if rank == 0:
    print("RESULT " + json.dumps(out))
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_metric_allreduce(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    addr = f"localhost:{_free_port()}"

    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX_")}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), addr, str(i), repo],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{so}\n{se}"
    line = next(
        line for line in outs[0][0].splitlines() if line.startswith("RESULT ")
    )
    # raw_decode: take the first JSON value and ignore anything interleaved
    # after it on the same line — absl/XLA log writes can share the stdout
    # line under load (observed once as "Extra data" at the JSON's end)
    got, _end = json.JSONDecoder().raw_decode(line[len("RESULT "):])

    # single-process union reference
    from aimnetcentral_tpu.train.metrics import MetricConfig, RegMultiMetric

    rng = np.random.default_rng(42)
    pred = rng.normal(size=(32,)).astype(np.float32)
    true = rng.normal(size=(32,)).astype(np.float32)
    ref = RegMultiMetric([MetricConfig(key_pred="e", key_true="e")])
    ref.update({"e": pred}, {"e": true})
    want = ref.compute()
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-5, err_msg=k)
