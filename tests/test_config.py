"""Config system tests: defaults, per-net defaults, CLI overlay, derived
keys, exp-dir naming."""
import pytest

from srcaco2_tpu import constants
from srcaco2_tpu.config.defaults import get_config
from srcaco2_tpu.config.parser import get_args, outfd, Dict2Obj


def test_default_config_keys():
    cfg = get_config(constants.SWINIR)
    assert cfg['task'] == constants.SUPER_RES
    assert cfg['scale'] == 2
    assert cfg['netG']['net_type'] == constants.SWINIR
    assert cfg['netG']['swinir_embed_dim'] == 180
    assert cfg['netG']['swinir_depths'] == [6, 6, 6, 6, 6, 6]
    assert cfg['train']['G_optimizer_type'] == constants.ADAM


@pytest.mark.parametrize('net', constants.MODELS)
def test_all_net_defaults_resolve(net):
    cfg = get_config(net)
    assert cfg['netG']['net_type'] == net


def test_cli_overlay_scalar_and_nested():
    cfg = get_args(['--net_type', 'SwinIR', '--scale', '8',
                    '--h_size', '128', '--l2', 'True',
                    '--l2_lambda', '1.0', '--ssim', 'True',
                    '--ssim_lambda', '5.', '--ssim_window_s', '19',
                    '--swinir_window_size', '8',
                    '--G_optimizer_lr', '0.0001',
                    '--swinir_upsampler', 'pixelshuffledirect'])
    assert cfg['scale'] == 8
    assert cfg['h_size'] == 128
    assert cfg['l2'] and cfg['ssim']
    assert cfg['ssim_window_s'] == 19
    assert cfg['train']['G_optimizer_lr'] == 1e-4
    assert cfg['netG']['swinir_upsampler'] == 'pixelshuffledirect'
    # derived: img_size = h_size // scale
    assert cfg['netG']['swinir_img_size'] == 16
    assert cfg['netG']['swinir_upscale'] == 8


def test_cli_list_flag_yaml():
    cfg = get_args(['--net_type', 'SwinIR',
                    '--swinir_depths', '[4, 4]',
                    '--swinir_num_heads', '[2, 2]'])
    assert cfg['netG']['swinir_depths'] == [4, 4]


def test_sanity_asserts():
    with pytest.raises(AssertionError):
        get_args(['--scale', '3'])
    with pytest.raises(AssertionError):
        get_args(['--h_size', '97', '--scale', '2'])


def test_outfd_naming():
    cfg = get_args(['--net_type', 'SRCNN', '--exp_id', 'abc',
                    '--train_dsets',
                    'caco2_train_X_2_in_256_out_512_cell_CELL1',
                    '--l2', 'True'])
    fd = outfd(cfg)
    assert 'SRCNN' in fd and 'id_abc' in fd and 'l2_yes' in fd
    assert fd.startswith('exps')


def test_dict2obj():
    cfg = get_config(constants.SRCNN)
    o = Dict2Obj(cfg)
    assert o.task == constants.SUPER_RES
    assert o.netG.net_type == constants.SRCNN
    assert o.train.G_optimizer_lr == 2e-4


def test_caco2_dataset_names():
    n = constants.caco2_name('train', 8, 'CELL2')
    assert n == 'caco2_train_X_8_in_64_out_512_cell_CELL2'
    assert constants.parse_caco2_name(n) == ('train', 8, 'CELL2')
    assert len(constants.datasets) == 27
