"""Cluster / preemption support.

Reference analog (SURVEY §2.11): Compute-Canada behaviors — datasets
rsync'd to node-local scratch at startup (utils_data_cc.py:34), the exp
dir mirrored back to durable storage every synch_scratch_epoch_freq
epochs (utils_exps.py:17), `passed.txt` sentinel, and restart-from-latest
elasticity. Generalized here for any SLURM-like preemptible setup.
"""
import os
import shutil
import subprocess

from srcaco2_tpu.utils.logger import DLLogger


def is_cluster() -> bool:
    """On a managed cluster (reference: CC_CLUSTER env)."""
    return bool(os.environ.get('CC_CLUSTER')
                or os.environ.get('SLURM_JOB_ID'))


def node_scratch_dir() -> str:
    return os.environ.get('SLURM_TMPDIR', '/tmp')


def is_node_master() -> bool:
    return int(os.environ.get('SLURM_LOCALID', 0)) == 0


def stage_dataset_to_node(src_root: str, subdirs=('caco2',)) -> str:
    """Copy the dataset to node-local scratch once per node (reference:
    move_datasets_scrach_to_node). Returns the new data_root."""
    if not is_cluster():
        return src_root
    dst_root = os.path.join(node_scratch_dir(), 'srcaco2_data')
    if is_node_master():
        for sd in subdirs:
            src = os.path.join(src_root, sd)
            dst = os.path.join(dst_root, sd)
            if os.path.isdir(src) and not os.path.isdir(dst):
                DLLogger.log(f'[cluster] staging {src} -> {dst}')
                if shutil.which('rsync'):
                    os.makedirs(dst_root, exist_ok=True)
                    subprocess.run(['rsync', '-a', src, dst_root],
                                   check=True)
                else:
                    shutil.copytree(src, dst)
    return dst_root


def sync_exp_to_durable(exp_dir: str, durable_root: str):
    """Mirror the (node-local) experiment dir to durable storage
    (reference: utils_exps.sync every synch_scratch_epoch_freq)."""
    if not durable_root:
        return
    dst = os.path.join(durable_root, os.path.basename(exp_dir.rstrip('/')))
    if shutil.which('rsync'):
        subprocess.run(['rsync', '-a', '--delete', exp_dir + '/', dst],
                       check=True)
    else:
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        shutil.copytree(exp_dir, dst)
    DLLogger.log(f'[cluster] synced {exp_dir} -> {dst}')
