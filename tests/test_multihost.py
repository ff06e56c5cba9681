"""Real multi-process data parallelism: two CPU processes with 4 virtual
devices each form one 8-device mesh via jax.distributed (the TPU-pod
launch shape, one process per host). Both must agree on the global-batch
loss at every step — the gradient all-reduce now crosses process
boundaries, which single-process mesh tests (test_multichip.py) cannot
exercise. Replaces the reference's torch.distributed.launch seam
(tools/scripts/dist_train.sh, common_utils.py:146-186).
"""

import os
import re
import socket
import subprocess
import sys
from pathlib import Path

import pytest

# 12 min of subprocess spawns + compiles; `pytest -m slow` runs it
pytestmark = pytest.mark.slow

ROOT = Path(__file__).resolve().parent.parent


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_train_step_agrees():
    port = _free_port()
    nprocs, local_dev = 2, 4
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS', 'PYTHONSTARTUP')}
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = f'--xla_force_host_platform_device_count={local_dev}'
    procs = [
        subprocess.Popen(
            [sys.executable, str(ROOT / 'tests' / '_multihost_worker.py'),
             f'127.0.0.1:{port}', str(nprocs), str(rank)],
            cwd=str(ROOT), env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for rank in range(nprocs)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f'worker failed:\n{out[-4000:]}'

    losses = {}
    for out in outs:
        m = re.search(r'MULTIHOST_LOSSES rank=(\d+) ([\d.]+) ([\d.]+)', out)
        assert m, f'no loss line in:\n{out[-4000:]}'
        losses[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    assert set(losses) == {0, 1}
    # replicated outputs must be bitwise-identical across processes
    assert losses[0] == losses[1], losses
    # and the optimizer update must have changed the loss (step 2 != step 1)
    assert losses[0][0] != losses[0][1], losses
