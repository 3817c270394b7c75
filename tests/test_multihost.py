"""2-process multihost training on a local jax.distributed CPU cluster.

Each process owns 1 virtual CPU device (dp=2 global) and runs the real
``Trainer.train`` loop over a dp=2 mesh with per-process batch feeding
(``global_batch_from_local``) — the pod-scale path the CLI uses when
``jax.process_count() > 1``.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_training(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, f"localhost:{port}", "2", str(pid), str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"MULTIHOST_OK pid={pid} step=4" in out, out[-4000:]
    assert (tmp_path / "best.ckpt").exists()
