"""Global registry constants for the SR-CACO-2 TPU framework.

Mirrors the *capabilities* of the reference registry
(/root/reference/dlib/utils/constants.py) — model names, dataset names,
metric names, sampling strategies, optimizer/scheduler names — re-expressed
for a JAX/TPU-native framework.
"""

# ---------------------------------------------------------------- tasks
SUPER_RES = 'super-resolution'
RECONSTRUCT = 'reconstruct'
TASKS = [SUPER_RES, RECONSTRUCT]

# net internal task (CSR-CNN may run a segmentation head).
REGRESSION = 'regression'
SEGMENTATION = 'segmentation'
NET_TASKS = [REGRESSION, SEGMENTATION]

# ---------------------------------------------------------------- models
# Transformers
SWINIR = 'SwinIR'
GRL = 'GRL'
ACT = 'ACT'
OMNISR = 'OmniSR'
# CNN, pre-upsampling
SRCNN = 'SRCNN'
VDSR = 'VDSR'
DRRN = 'DRRN'
MEMNET = 'MemNet'
# CNN/attention, post-upsampling
NLSN = 'NLSN'
ENLCN = 'ENLCN'
DFCAN = 'DFCAN'
EDSR_LIIF = 'EDSR_LIIF'
# Iterative up-down sampling
SRFBN = 'SRFBN'
DBPN = 'DBPN'
# Progressive
MSLAPSR = 'MSLapSRN'
PROSR = 'ProSR'
# Research models (reference author's)
DSRSPLINES = 'DSRSplines'
CSRCNN = 'CSRCNN'

MODELS = [SWINIR, DSRSPLINES, CSRCNN, DFCAN, SRCNN, VDSR, MEMNET, DRRN,
          OMNISR, GRL, ENLCN, ACT, NLSN, EDSR_LIIF, SRFBN, DBPN, MSLAPSR,
          PROSR]

# Pseudo-model evaluated as the sanity floor next to every eval.
INTERPOLATE = 'Interpolate'

# Networks that consume the bicubically pre-upscaled input (l_to_h_img)
# instead of the raw LR image (reference: model_plain.py:196-197 plus the
# nets that interpolate internally take raw LR).
PRE_UPSAMPLED_INPUT_NETS = [SRCNN]

# method name <-> net type: the reference keeps a METHOD string per net.
NETTYPE_METHOD = {m: m for m in MODELS}

# ---------------------------------------------------------------- init
INIT_W_NORMAL = 'init_w_normal'
INIT_W_UNIFORM = 'init_w_uniform'
INIT_W_XAVIER_NORMAL = 'init_w_xavier_normal'
INIT_W_XAVIER_UNIFORM = 'init_w_xavier_uniform'
INIT_W_KAIMING_NORMAL = 'init_w_kaiming_normal'
INIT_W_KAIMING_UNIFORM = 'init_w_kaiming_uniform'
INIT_W_ORTHOGONAL = 'init_w_orthogonal'
INIT_W_DEFAULT = 'init_w_default'
INIT_W = [INIT_W_NORMAL, INIT_W_UNIFORM, INIT_W_XAVIER_NORMAL,
          INIT_W_XAVIER_UNIFORM, INIT_W_KAIMING_NORMAL,
          INIT_W_KAIMING_UNIFORM, INIT_W_ORTHOGONAL, INIT_W_DEFAULT]

INIT_BN_UNIFORM = 'init_bn_uniform'
INIT_BN_CONSTANT = 'init_bn_constant'
INIT_BN = [INIT_BN_CONSTANT, INIT_BN_UNIFORM]

# swinir upsampler styles
US_PIXEL_SHUFFLE = 'pixelshuffle'
US_PIXEL_SHUFFLE_DIRECT = 'pixelshuffledirect'
US_NEAREST_CONV = 'nearest_conv'

R_CONNECTION_1CONV = '1conv'
R_CONNECTION_3CONV = '3conv'

# ---------------------------------------------------------------- phases
TRAIN_PHASE = 'train'
EVAL_PHASE = 'eval'
PHASES = [TRAIN_PHASE, EVAL_PHASE]

TRAINSET = 'train'
VALIDSET = 'val'
TESTSET = 'test'
SPLITS = [TRAINSET, VALIDSET, TESTSET]

# ---------------------------------------------------------------- metrics
PSNR_MTR = 'psnr'
SSIM_MTR = 'ssim'
MSE_MTR = 'mse'
NRMSE_MTR = 'nrmse'
PSNR_Y_MTR = 'psnr_y'
SSIM_Y_MTR = 'ssim_y'
METRICS = [PSNR_MTR, SSIM_MTR, MSE_MTR, NRMSE_MTR, PSNR_Y_MTR, SSIM_Y_MTR]

BEST_MTR = {
    PSNR_MTR: max,
    SSIM_MTR: max,
    MSE_MTR: min,
    NRMSE_MTR: min,
    PSNR_Y_MTR: max,
    SSIM_Y_MTR: max,
}

# ROI thresholds: ROI metrics are marginalized (averaged) over these
# intensity thresholds (reference: constants.py:817).
ROI_THRESH = [4, 5, 6, 7, 8, 9, 10]

# ---------------------------------------------------------------- datasets
CELL0 = 'CELL0'  # Survivin
CELL1 = 'CELL1'  # E-cadherin / GFP-tubulin
CELL2 = 'CELL2'  # mCherry-Histone-H2B
CELLS = [CELL0, CELL1, CELL2]

SCALES = [2, 4, 8]

_CACO2_FMT = 'caco2_{split}_X_{scale}_in_{inres}_out_512_cell_{cell}'


def caco2_name(split: str, scale: int, cell: str) -> str:
    """Canonical dataset name, e.g.
    caco2_train_X_8_in_64_out_512_cell_CELL2. `cell` also accepts BioSR
    structure names (CCP/ER/MT/F-actin) for the biosr builder."""
    assert split in SPLITS, split
    assert scale in SCALES, scale
    return _CACO2_FMT.format(split=split, scale=scale, inres=512 // scale,
                             cell=cell)


datasets = [caco2_name(s, x, c) for x in SCALES for c in CELLS
            for s in SPLITS]


def parse_caco2_name(name: str):
    """Inverse of caco2_name -> (split, scale, cell). Also accepts
    biosr_* names built with the same pattern (data/build_scripts
    biosr builder)."""
    parts = name.split('_')
    assert parts[0] in ('caco2', 'biosr'), name
    split = parts[1]
    scale = int(parts[3])
    cell = parts[-1]
    return split, scale, cell


# ---------------------------------------------------------------- interp
INTER_BICUBIC = 'bicubic'
INTER_BILINEAR = 'bilinear'
INTER_NEAREST = 'nearest'
INTERPOLATION_MODES = [INTER_BICUBIC, INTER_BILINEAR, INTER_NEAREST]

# ---------------------------------------------------------------- sampling
SAMPLE_UNIF = 'uniform'
SAMPLE_ROI = 'roi'
SAMPLE_EDT = 'edt'
SAMPLE_EDTXROI = 'edt*roi'
SAMPLE_PATCHES = [SAMPLE_UNIF, SAMPLE_ROI, SAMPLE_EDT, SAMPLE_EDTXROI]

TH_AUTO = 'automatic_threshold'
TH_FIX = 'fix_threshold'
ROI_STYLE_TH = [TH_AUTO, TH_FIX]

VAR_GLOBAL = 'var-global'
VAR_ADAPTIVE = 'var-adaptive'
VAR_TYPES = [VAR_GLOBAL, VAR_ADAPTIVE]

# ---------------------------------------------------------------- optim
SGD = 'sgd'
ADAM = 'adam'
OPTIMIZERS = [SGD, ADAM]

MULTISTEPLR = 'MultiStepLR'
MYSTEPLR = 'MyStepLR'
STEPSLR = [MULTISTEPLR, MYSTEPLR]

# ---------------------------------------------------------------- losses
NORM1 = '1'
NORM2 = '2'
NORM0EXP = '0EXP'
KL = 'KL'
BH = 'BHATTACHARYYA'
NORMS = [NORM1, NORM2, NORM0EXP]
LPNORMS = [NORM1, NORM2]

# ---------------------------------------------------------------- parallel
# TPU-native communication rides the JAX device mesh; these names pick the
# host bootstrap (reference analog: gloo/nccl/mpi at constants.py:678).
BACKEND_ICI = 'ici'          # single-host mesh over ICI
BACKEND_MULTIHOST = 'dcn'    # jax.distributed multi-host
BACKENDS = [BACKEND_ICI, BACKEND_MULTIHOST]

DATA_AXIS = 'data'           # mesh axis name for data parallelism
MODEL_AXIS = 'model'         # mesh axis name for tensor/model parallelism

# ---------------------------------------------------------------- splines
SPLINE_NET_TYPES = [f'snet_type{i}' for i in range(1, 9)]
SPLINEHIDDEN = {
    f'snet_type{i}': [32] * (i - 1) + [16] for i in range(1, 9)
}
SPLINEHIDDEN['snet_type1'] = [16]

NET_TYPE_UNET = 'unet'
NET_TYPE_PYRAMID = 'pyramid'

# small-CNN layer configs for the CSR-CNN 'snet_type*' variants.
NETS_CNN = {
    'snet_type1': [32],
    'snet_type2': [32, 32],
    'snet_type3': [256, 256, 256],
    'snet_type4': [32] * 4,
    'snet_type5': [32] * 5,
    'snet_type6': [32] * 6,
    'snet_type7': [32] * 7,
    'snet_type8': [32] * 8,
}

RELU = 'RELU'
TANH = 'TANH'
NONE_ACTIV = 'None'
ACTIVATIONS = [RELU, TANH, NONE_ACTIV]

# ---------------------------------------------------------------- misc
CODE_IDENTIFIER = 'CODEXXXXXXXIDENTIFIER'
FORMAT_DEBUG = 'DEBUG_{}'
