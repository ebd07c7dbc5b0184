"""End-to-end pre-test of the real-data onboarding kit (VERDICT r3 #6):
the `python -m srcaco2_tpu.diagnosis.parity` command is exercised on a
synthetic dataset with a FABRICATED published table (so the bicubic
verification passes/fails meaningfully) and a real reference torch
`.pth` ported + evaluated — proving the whole kit works before the
real SR-CACO-2 data ever shows up."""
import os

import numpy as np
import pytest
import yaml

torch = pytest.importorskip('torch')

from srcaco2_tpu import constants
from srcaco2_tpu.diagnosis.parity import (eval_bicubic, main,
                                          load_pth_state)


@pytest.fixture(scope='module')
def ds_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('onboard'))
    from srcaco2_tpu.data.synthetic import make_synthetic_dataset
    make_synthetic_dataset(root, scale=2, cell='CELL0',
                           n_train=2, n_val=1, n_test=3, size=64)
    return root


def test_onboarding_kit_end_to_end(ds_root, tmp_path):
    # fabricate the "published" table from the actual bicubic numbers
    # (on real data these would be the NeurIPS Table-5/4 rows)
    bi = eval_bicubic(ds_root, ds_root, 2, 'CELL0')
    pub = {'full': {'2,CELL0': float(bi['full']['psnr'])},
           'roi': {'2,CELL0': float(bi['roi']['psnr'])}}
    pub_path = os.path.join(str(tmp_path), 'published.yaml')
    with open(pub_path, 'w') as f:
        yaml.safe_dump(pub, f)

    # a real reference pretrained checkpoint: the reference's own torch
    # SRCNN, saved exactly like model_base.save_network does
    from tests.ref_import import install
    install()
    from srcaco2_tpu.config.defaults import get_config
    from tests.test_parity_torch import build_ref
    args = get_config(constants.SRCNN)
    args['n_channels'] = 1
    args['netG']['srcnn_in_chans'] = 1
    torch.manual_seed(0)
    tnet = build_ref(args).eval()
    pth = os.path.join(str(tmp_path), 'G-model.pth')
    torch.save(tnet.state_dict(), pth)

    out_md = os.path.join(str(tmp_path), 'report.md')
    rc = main(['--data_root', ds_root, '--scales', '2',
               '--cells', 'CELL0', '--published', pub_path,
               '--pth', pth, '--net', constants.SRCNN,
               '--pth_scale', '2', '--pth_cell', 'CELL0',
               '--out', out_md])
    assert rc == 0
    md = open(out_md).read()
    assert 'PASS' in md and 'FAIL' not in md
    assert 'SRCNN (ported .pth)' in md
    assert '| Bicubic |' in md

    # a wrong published row must FAIL (the check is not vacuous)
    pub['full']['2,CELL0'] += 1.0
    with open(pub_path, 'w') as f:
        yaml.safe_dump(pub, f)
    rc = main(['--data_root', ds_root, '--scales', '2',
               '--cells', 'CELL0', '--published', pub_path,
               '--out', out_md])
    assert rc == 1
    assert 'FAIL' in open(out_md).read()


def test_load_pth_state_unwraps_and_filters(tmp_path):
    """KAIR-style 'params' nesting unwraps; integer index/mask buffers
    are dropped (the flax side rebuilds them at trace time)."""
    sd = {'params': {
        'conv.weight': torch.zeros(4, 1, 3, 3),
        'conv.bias': torch.zeros(4),
        'layers.0.attn_mask': torch.zeros(4, 4),
        'rpi.relative_position_index': torch.zeros(9, 9,
                                                   dtype=torch.long)}}
    p = os.path.join(str(tmp_path), 'x.pth')
    torch.save(sd, p)
    got = load_pth_state(p)
    names = [n for n, _ in got]
    assert names == ['conv.weight', 'conv.bias']
    assert all(a.dtype == np.float32 for _, a in got)
