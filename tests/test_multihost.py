"""REAL 2-process jax.distributed run (VERDICT r1 #7): two CPU
processes (4 virtual devices each, 8 global) form one mesh, stage
global replicated data via make_array_from_process_local_data, train
sharded steps, and run the process-sharded fast_eval with
cross-process metric gathering. Both ranks must agree bit-for-bit."""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_distributed(tmp_path):
    from srcaco2_tpu.data.synthetic import make_synthetic_dataset
    root = str(tmp_path)
    make_synthetic_dataset(root, scale=2, n_train=6, n_val=5,
                           n_test=2, size=64)

    coord = f'127.0.0.1:{_free_port()}'
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)        # worker sets its own device count
    env['JAX_PLATFORMS'] = 'cpu'
    env['PALLAS_AXON_POOL_IPS'] = ''
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(REPO, 'tests', 'mh_worker.py'),
         coord, '2', str(rank), root],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        text=True) for rank in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=560)
        assert p.returncode == 0, f'rc={p.returncode}\n{err[-3000:]}'
        outs.append(json.loads(out.strip().splitlines()[-1]))

    r0, r1 = sorted(outs, key=lambda o: o['rank'])
    assert r0['devices'] == r1['devices'] == 8
    # replicated state + sharded batch => identical losses on both
    np.testing.assert_allclose(r0['losses'], r1['losses'], rtol=1e-6)
    # eval: 5 samples over batches of 2 split across processes, but the
    # gathered result is complete and identical on both ranks
    assert r0['eval_n'] == r1['eval_n'] == 5
    assert r0['n_details'] == r1['n_details'] == 5
    np.testing.assert_allclose(r0['psnr'], r1['psnr'], rtol=1e-9)
    assert np.isfinite(r0['psnr']) and r0['psnr'] > 0
