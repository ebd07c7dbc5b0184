"""Coverage for the compat image shim, profiling, and cluster utils."""
import os

import numpy as np
import jax.numpy as jnp


def test_image_utils_compat_roundtrips():
    from srcaco2_tpu.utils import image_utils as U
    img = np.random.default_rng(0).integers(0, 256, (16, 12, 1)
                                            ).astype(np.uint8)
    s = U.uint2single(img)
    assert s.dtype == np.float32 and s.max() <= 1.0
    np.testing.assert_array_equal(U.single2uint(s), img)
    t = U.single2tensor3(s)
    assert t.shape == (1, 16, 12)
    back = U.tensor2uint(t)
    np.testing.assert_array_equal(back[..., None]
                                  if back.ndim == 2 else back, img)
    assert U.modcrop(img, 5).shape == (15, 10, 1)
    assert U.shave(img, 2).shape == (12, 8, 1)
    # dihedral host version: involution check for mode 0, shape for all
    for m in range(8):
        a = U.augment_img(s, m)
        assert a.shape in ((16, 12, 1), (12, 16, 1))
    r = U.imresize_np(img[..., 0].astype(np.float32), 0.5)
    assert r.shape == (8, 6)
    assert U.is_caco2('/data/caco2/x.tif') and not U.is_biosr('x')


def test_step_timer_and_memory_stats():
    from srcaco2_tpu.utils.profiling import (StepTimer,
                                             device_memory_stats)
    t = StepTimer(warmup=1)
    for _ in range(5):
        t.tick()
    assert t.mean > 0
    assert 'steps=5' in t.summary(batch_size=4) or 'steps=' in \
        t.summary(batch_size=4)
    stats = device_memory_stats()
    assert isinstance(stats, dict) and stats


def test_trace_window_disabled_noop(tmp_path):
    from srcaco2_tpu.utils.profiling import trace_window
    with trace_window(str(tmp_path), enabled=False):
        pass  # must not create profiler state


def test_cluster_helpers(monkeypatch, tmp_path):
    from srcaco2_tpu.utils import cluster as C
    monkeypatch.delenv('CC_CLUSTER', raising=False)
    monkeypatch.delenv('SLURM_JOB_ID', raising=False)
    assert not C.is_cluster()
    # staging is a no-op off-cluster
    assert C.stage_dataset_to_node('/some/root') == '/some/root'
    monkeypatch.setenv('SLURM_JOB_ID', '1')
    monkeypatch.setenv('SLURM_TMPDIR', str(tmp_path))
    monkeypatch.setenv('SLURM_LOCALID', '0')
    assert C.is_cluster() and C.is_node_master()
    # sync_exp_to_durable mirrors a directory
    src = tmp_path / 'exp'
    src.mkdir()
    (src / 'a.txt').write_text('x')
    dst_root = tmp_path / 'durable'
    dst_root.mkdir()
    C.sync_exp_to_durable(str(src), str(dst_root))
    assert (dst_root / 'exp' / 'a.txt').read_text() == 'x'
