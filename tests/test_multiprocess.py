"""True multi-process jax.distributed execution on localhost CPU.

Spawns 2 worker processes (4 virtual devices each) via
scripts/run_multiprocess_cpu.py: coordinator handshake, process-spanning
8-way mesh, the full distributed train step with collectives crossing
process boundaries, and a multi-host orbax checkpoint roundtrip.  This is
the execution-evidence test for `parallel.runtime.ensure_distributed`
(SURVEY.md §2.3 collective backend / §5 multi-host runtime).

Marked `multiproc` so it can be deselected (`-m "not multiproc"`) in
environments where subprocess spawning or localhost ports are unavailable;
it runs in the default suite here (~60-90 s).
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, 'scripts', 'run_multiprocess_cpu.py')


@pytest.mark.multiproc
@pytest.mark.slow
def test_two_process_distributed_train_and_checkpoint(tmp_path):
    env = dict(os.environ)
    env.pop('PALLAS_AXON_POOL_IPS', None)
    # the launcher sets the workers' env itself; keep the parent minimal
    proc = subprocess.run(
        [sys.executable, SCRIPT, '--num-processes', '2',
         '--devices-per-process', '4', '--timeout', '240'],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=280)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary['ok'], summary
    assert summary['processes'] == 2
    assert summary['global_devices'] == 8
    assert summary['loss0_err'] < 1e-10
    assert summary['grad_max_abs_err'] < 1e-8
    assert summary['ckpt_roundtrip_max_abs_err'] == 0.0
    # the a2a and slice-chunked-overlap transports reproduce the
    # all_gather SGD update with their collectives crossing the real
    # process (gRPC) boundary
    assert summary['all_to_all_update_max_abs_diff'] < 1e-10
    assert summary['overlap_update_max_abs_diff'] < 1e-10
