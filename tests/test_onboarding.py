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


# ------------------------- round 5: real-data last-mile (VERDICT r4 #9)
def test_manifest_validator(tmp_path):
    """The fold-layout validator passes the shipped folds.zip against
    the shipped manifest, and catches truncation, edits, missing
    files, broken inverse mappings, and missing images."""
    from srcaco2_tpu.diagnosis import manifest as M
    root = str(tmp_path / 'splits')
    os.makedirs(root)
    ds = 'caco2_test_X_2_in_256_out_512_cell_CELL0'
    rep = M.validate_layout(root, expected_path=M.SHIPPED_MANIFEST,
                            ds_names=[ds])
    assert rep['ok'], rep['errors']

    # truncation is caught by both the pair count and the checksum
    fd = os.path.join(root, M.FOLDS_SUBDIR, ds)
    lh = os.path.join(fd, 'l_h.txt')
    lines = open(lh).read().splitlines()
    with open(lh, 'w') as f:
        f.write('\n'.join(lines[:10]) + '\n')
    rep = M.validate_layout(root, expected_path=M.SHIPPED_MANIFEST,
                            ds_names=[ds])
    errs = '\n'.join(rep['errors'])
    assert not rep['ok']
    assert 'pairs' in errs and 'sha256' in errs and 'inverse' not in errs

    # CLI: exit 1 on the broken layout, missing fold dir reported
    rc = M.main(['--splits_root', root, '--datasets',
                 ds + ',caco2_test_X_4_in_128_out_512_cell_CELL9'])
    assert rc == 1

    # a non-inverse h_l.txt is structural, not checksum
    with open(lh, 'w') as f:
        f.write('a.tif,b.tif\n')
    with open(os.path.join(fd, 'h_l.txt'), 'w') as f:
        f.write('b.tif,WRONG.tif\n')
    rep = M.validate_layout(root, ds_names=[ds])
    assert any('inverse' in e for e in rep['errors'])

    # image-existence: one of the two referenced files is missing
    data_root = str(tmp_path / 'data')
    os.makedirs(data_root)
    with open(os.path.join(fd, 'h_l.txt'), 'w') as f:
        f.write('b.tif,a.tif\n')
    with open(os.path.join(data_root, 'a.tif'), 'w') as f:
        f.write('x')
    rep = M.validate_layout(root, data_root=data_root, ds_names=[ds])
    assert any('missing under' in e and 'b.tif' in e
               for e in rep['errors'])


def test_shipped_manifest_matches_folds_zip(tmp_path):
    """The committed folds_manifest.yaml IS the manifest of the shipped
    folds.zip (regenerating it is a no-op) and covers the full 27-ds
    grid."""
    import yaml
    from srcaco2_tpu.diagnosis import manifest as M
    got = M.fold_manifest(str(tmp_path))
    with open(M.SHIPPED_MANIFEST) as f:
        want = yaml.safe_load(f)['datasets']
    assert got == want
    assert sorted(got) == sorted(M.all_dataset_names())


def test_discover_pth_checkpoints(tmp_path):
    """Path parsing over the published shared-trained-models layout:
    netG_ tag, method-dir fallback, and loud skip of unparseable."""
    from srcaco2_tpu.diagnosis.parity import discover_pth_checkpoints
    root = str(tmp_path)

    def mk(*parts):
        p = os.path.join(root, *parts, 'best-models')
        os.makedirs(p)
        open(os.path.join(p, 'G-model.pth'), 'w').close()

    mk('super-resolution', 'ACT',
       'caco2_train_X_2_in_256_out_512_cell_CELL0',
       'id_12_21-tsk_super-resolution-x_2-netG_ACT-sd_0-l2_yes')
    mk('super-resolution', 'SwinIR',
       'caco2_train_X_8_in_64_out_512_cell_CELL2', 'no_tag_here')
    mk('super-resolution', 'NOTANET',
       'caco2_train_X_4_in_128_out_512_cell_CELL1', 'no_tag')
    got = discover_pth_checkpoints(root)
    trip = sorted((n, s, c) for _, n, s, c in got)
    assert trip == [('ACT', 2, 'CELL0'), ('SwinIR', 8, 'CELL2')]


def test_pth_batch_mode(ds_root, tmp_path):
    """--pth_root walks a fabricated published-layout tree: the good
    SRCNN checkpoint evaluates, the corrupt one fails WITHOUT killing
    the walk, and the exit code reports the failure."""
    from tests.ref_import import install
    install()
    from srcaco2_tpu.config.defaults import get_config
    from tests.test_parity_torch import build_ref
    args = get_config(constants.SRCNN)
    args['n_channels'] = 1
    args['netG']['srcnn_in_chans'] = 1
    torch.manual_seed(0)
    tnet = build_ref(args).eval()

    tree = str(tmp_path / 'shared-trained-models')
    good = os.path.join(tree, 'super-resolution', 'SRCNN',
                        'caco2_train_X_2_in_256_out_512_cell_CELL0',
                        'id_a-tsk_sr-x_2-netG_SRCNN-sd_0', 'best-models')
    bad = os.path.join(tree, 'super-resolution', 'VDSR',
                       'caco2_train_X_2_in_256_out_512_cell_CELL0',
                       'id_b-tsk_sr-x_2-netG_VDSR-sd_0', 'best-models')
    os.makedirs(good)
    os.makedirs(bad)
    torch.save(tnet.state_dict(), os.path.join(good, 'G-model.pth'))
    torch.save({'garbage.weight': torch.zeros(3, 3)},
               os.path.join(bad, 'G-model.pth'))

    out_md = os.path.join(str(tmp_path), 'report.md')
    rc = main(['--data_root', ds_root, '--scales', '2',
               '--cells', 'CELL0', '--pth_root', tree, '--out', out_md])
    assert rc == 3          # the VDSR port failure is surfaced...
    md = open(out_md).read()
    assert 'SRCNN (ported .pth)' in md   # ...but the walk completed
