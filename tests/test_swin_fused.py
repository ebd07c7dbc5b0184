"""Fused Swin block kernel (ops/pallas/swin_block.py) and
FusedBlockStack (models/swin_fused.py): math parity in interpret mode.

The pallas path's full-attention reformulation (shift folded into a
precomputed bias/mask in raster token order) is validated against the
classic roll/partition windowed formulation — i.e. against the torch
SwinIR semantics (network_swinir.py:199/239/276)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from srcaco2_tpu.ops.pallas.swin_block import (
    build_attn_bias, full_attn_mask_and_index, fused_swin_block,
    swin_block_ref, NEG_INF)
from srcaco2_tpu.models.swin_fused import FusedBlockStack
from srcaco2_tpu.models.swinir import shift_attn_mask, window_partition

B, H, W, C, NH, WS, D = 3, 8, 12, 24, 4, 4, 4
T = H * W
F32 = jnp.float32


def _params(key, c=C, ch=2 * C):
    r = np.random.default_rng(key)
    g = lambda *s: jnp.asarray(r.normal(0, 0.1, s), F32)
    return {
        'ln1_scale': 1.0 + g(c), 'ln1_bias': g(c),
        'qkv_kernel': g(c, 3 * c), 'qkv_bias': g(3 * c),
        'proj_kernel': g(c, c), 'proj_bias': g(c),
        'ln2_scale': 1.0 + g(c), 'ln2_bias': g(c),
        'mlp1_kernel': g(c, ch), 'mlp1_bias': g(ch),
        'mlp2_kernel': g(ch, c), 'mlp2_bias': g(c),
    }


@pytest.fixture(scope='module')
def data():
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(0, 1, (B, T, C)), F32)
    tables = jnp.asarray(r.normal(0, 0.02, (D, (2 * WS - 1) ** 2, NH)),
                         F32)
    return x, _params(1), tables


def test_mask_matches_torch_shift_semantics():
    """Full-attention mask == (same rolled window) AND (shift_attn_mask
    == 0), checked against the reference-style mask construction."""
    for shift in (0, WS // 2):
        mask, rel = full_attn_mask_and_index(H, W, WS, shift)
        # build the expected mask from the windowed formulation:
        # token order after roll+partition
        idx = np.arange(T).reshape(1, H, W, 1).astype(np.float32)
        idx = np.roll(idx, (-shift, -shift), axis=(1, 2))
        wins = np.asarray(window_partition(jnp.asarray(idx), WS)
                          ).astype(int)[..., 0]        # (nW, ws*ws)
        expected = np.full((T, T), NEG_INF, np.float32)
        if shift:
            smask = shift_attn_mask(H, W, WS, shift)    # (nW, n, n)
        for wi, wtok in enumerate(wins):
            for a in range(len(wtok)):
                for b in range(len(wtok)):
                    blocked = shift and smask[wi, a, b] != 0
                    if not blocked:
                        expected[wtok[a], wtok[b]] = 0.0
        np.testing.assert_array_equal(mask, expected)
        # relative index symmetric diag = center of table
        center = (WS - 1) * (2 * WS - 1) + (WS - 1)
        assert (np.diag(rel) == center).all()


def test_kernel_forward_matches_oracle(data):
    x, params, tables = data
    bias = build_attn_bias(tables, H, W, WS)
    for bi in (0, 1):
        out_k = fused_swin_block(x, params, bias[bi], heads=NH,
                                 interpret=True, compute_dtype=F32)
        out_r = swin_block_ref(x, params, bias[bi], heads=NH,
                               compute_dtype=F32)
        np.testing.assert_allclose(np.asarray(out_k),
                                   np.asarray(out_r), atol=2e-6)


def test_kernel_grads_match_autodiff_oracle(data):
    x, params, tables = data

    def mk(fn):
        def loss(x, params, tables):
            b = build_attn_bias(tables, H, W, WS)
            y = fn(x, params, b[1], heads=NH)
            return jnp.sum(y * jnp.cos(0.1 * jnp.arange(
                y.size, dtype=F32).reshape(y.shape)))
        return jax.grad(loss, argnums=(0, 1, 2))

    gk = mk(lambda *a, **k: fused_swin_block(
        *a, interpret=True, compute_dtype=F32, **k))(x, params, tables)
    gr = mk(lambda *a, **k: swin_block_ref(
        *a, compute_dtype=F32, **k))(x, params, tables)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=max(3e-5 * scale, 3e-6))


def test_pair_kernel_matches_two_single_blocks(data):
    """Pair-fused kernel (2 blocks per pallas_call,
    SRCACO2_SWIN_PAIR) == two chained single-block kernels: forward
    and all grads."""
    from srcaco2_tpu.ops.pallas.swin_block import fused_swin_block_pair
    x, params_a, tables = data
    params_b = _params(2)
    bias = build_attn_bias(tables, H, W, WS)

    def loss_pair(x, pa, pb):
        y = fused_swin_block_pair(x, pa, bias[0], pb, bias[1],
                                  heads=NH, interpret=True,
                                  compute_dtype=F32)
        return jnp.sum(jnp.sin(y))

    def loss_chain(x, pa, pb):
        y = fused_swin_block(x, pa, bias[0], heads=NH,
                             interpret=True, compute_dtype=F32)
        y = fused_swin_block(y, pb, bias[1], heads=NH,
                             interpret=True, compute_dtype=F32)
        return jnp.sum(jnp.sin(y))

    vp, gp = jax.value_and_grad(loss_pair, argnums=(0, 1, 2))(
        x, params_a, params_b)
    vc, gc = jax.value_and_grad(loss_chain, argnums=(0, 1, 2))(
        x, params_a, params_b)
    np.testing.assert_allclose(float(vp), float(vc), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gc)):
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=max(3e-5 * scale, 3e-6))


def test_hd_pad_matches_unpadded(data, monkeypatch):
    """SRCACO2_SWIN_HD_PAD zero-pads head lanes (hd 6 -> 8 here; 30 ->
    32 at the flagship) purely inside the weights; the model function
    is mathematically unchanged (padding adds exact zeros to every
    contraction) — forward and grads must agree to reduction-order
    rounding (~1 ulp: a width-8 vs width-6 contraction may group its
    partial sums differently), single and pair kernels."""
    from srcaco2_tpu.ops.pallas.swin_block import fused_swin_block_pair
    x, params_a, tables = data
    params_b = _params(2)
    bias = build_attn_bias(tables, H, W, WS)

    def loss_single(x, p):
        y = fused_swin_block(x, p, bias[1], heads=NH,
                             interpret=True, compute_dtype=F32)
        return jnp.sum(jnp.sin(y)), y

    def loss_pair(x, pa, pb):
        y = fused_swin_block_pair(x, pa, bias[0], pb, bias[1],
                                  heads=NH, interpret=True,
                                  compute_dtype=F32)
        return jnp.sum(jnp.sin(y)), y

    (v0, y0), g0 = jax.value_and_grad(loss_single, argnums=(0, 1),
                                      has_aux=True)(x, params_a)
    (vp0, yp0), gp0 = jax.value_and_grad(loss_pair, argnums=(0, 1, 2),
                                         has_aux=True)(
        x, params_a, params_b)
    monkeypatch.setenv('SRCACO2_SWIN_HD_PAD', '8')
    (v1, y1), g1 = jax.value_and_grad(loss_single, argnums=(0, 1),
                                      has_aux=True)(x, params_a)
    (vp1, yp1), gp1 = jax.value_and_grad(loss_pair, argnums=(0, 1, 2),
                                         has_aux=True)(
        x, params_a, params_b)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(yp1), np.asarray(yp0),
                               atol=2e-6)
    for a, b in list(zip(jax.tree.leaves(g1), jax.tree.leaves(g0))) \
            + list(zip(jax.tree.leaves(gp1), jax.tree.leaves(gp0))):
        assert a.shape == b.shape        # grads are in MODEL shapes
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=max(3e-6 * scale, 1e-7))


def test_hd_pad_auto_default(monkeypatch):
    """Round-4 flip: SRCACO2_SWIN_HD_PAD defaults to 'auto' — pad hd up
    to the next multiple of 8 iff the lane overhead is <= 25% (flagship
    hd=30 -> 32: measured 39.96 -> 32.48 ms/step in-process A/B,
    /tmp-logged and recorded in docs/BENCH_ANALYSIS.md). Explicit ints
    override; tiny heads where padding would inflate the attention
    matmuls stay unpadded."""
    from srcaco2_tpu.ops.pallas import swin_block as sb
    monkeypatch.delenv('SRCACO2_SWIN_HD_PAD', raising=False)
    monkeypatch.delenv('SRCACO2_SWIN_MLP_PAD', raising=False)
    cfg = sb._env_cfg()
    assert cfg.hd_pad == sb._HD_PAD_AUTO
    # mlp_pad defaults OFF (unproven on TPU; see _env_cfg comment) —
    # opt in with SRCACO2_SWIN_MLP_PAD=auto
    assert cfg.mlp_pad == 0
    monkeypatch.setenv('SRCACO2_SWIN_MLP_PAD', 'auto')
    cfg = sb._env_cfg()
    assert cfg.mlp_pad == sb._HD_PAD_AUTO
    # flagship: C=180 / 6 heads -> hd 30, 6.7% overhead -> pad to 32;
    # MLP hidden ch=360 -> 384 (next 128 multiple, 6.7%)
    r = sb._resolve_pads(cfg, 6, 180, 360)
    assert r.hd_pad == 32 and r.mlp_pad == 384
    # aligned already (hd 32, ch 384): no-op
    r = sb._resolve_pads(cfg, 6, 192, 384)
    assert r.hd_pad == 0 and r.mlp_pad == 0
    # tiny widths (hd 6 -> 8 = 33%; ch 72 -> 128 = 78%): stay off
    r = sb._resolve_pads(cfg, 6, 36, 72)
    assert r.hd_pad == 0 and r.mlp_pad == 0
    # hd 10 -> 16 (60%): off;  hd 20 -> 24 (20%): on
    assert sb._resolve_pads(cfg, 6, 60, 384).hd_pad == 0
    assert sb._resolve_pads(cfg, 6, 120, 384).hd_pad == 24
    # explicit override wins over auto
    monkeypatch.setenv('SRCACO2_SWIN_HD_PAD', '0')
    monkeypatch.setenv('SRCACO2_SWIN_MLP_PAD', '0')
    r = sb._resolve_pads(sb._env_cfg(), 6, 180, 360)
    assert r.hd_pad == 0 and r.mlp_pad == 0
    monkeypatch.setenv('SRCACO2_SWIN_HD_PAD', '32')
    monkeypatch.setenv('SRCACO2_SWIN_MLP_PAD', '128')
    r = sb._resolve_pads(sb._env_cfg(), 6, 36, 72)
    assert r.hd_pad == 32 and r.mlp_pad == 128


def test_mlp_pad_matches_unpadded(data, monkeypatch):
    """SRCACO2_SWIN_MLP_PAD zero-pads the MLP hidden width (ch 72 ->
    128 here; 360 -> 384 at the flagship) purely inside the weights;
    gelu(0)=0 makes the pad exact in forward and backward — outputs and
    grads (in MODEL shapes) must agree to reduction-order rounding,
    single and pair kernels."""
    from srcaco2_tpu.ops.pallas.swin_block import fused_swin_block_pair
    x, params_a, tables = data
    params_b = _params(2)
    bias = build_attn_bias(tables, H, W, WS)

    def loss_single(x, p):
        y = fused_swin_block(x, p, bias[1], heads=NH,
                             interpret=True, compute_dtype=F32)
        return jnp.sum(jnp.sin(y)), y

    def loss_pair(x, pa, pb):
        y = fused_swin_block_pair(x, pa, bias[0], pb, bias[1],
                                  heads=NH, interpret=True,
                                  compute_dtype=F32)
        return jnp.sum(jnp.sin(y)), y

    (v0, y0), g0 = jax.value_and_grad(loss_single, argnums=(0, 1),
                                      has_aux=True)(x, params_a)
    (vp0, yp0), gp0 = jax.value_and_grad(loss_pair, argnums=(0, 1, 2),
                                         has_aux=True)(
        x, params_a, params_b)
    monkeypatch.setenv('SRCACO2_SWIN_MLP_PAD', '128')
    (v1, y1), g1 = jax.value_and_grad(loss_single, argnums=(0, 1),
                                      has_aux=True)(x, params_a)
    (vp1, yp1), gp1 = jax.value_and_grad(loss_pair, argnums=(0, 1, 2),
                                         has_aux=True)(
        x, params_a, params_b)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(yp1), np.asarray(yp0),
                               atol=2e-6)
    for a, b in list(zip(jax.tree.leaves(g1), jax.tree.leaves(g0))) \
            + list(zip(jax.tree.leaves(gp1), jax.tree.leaves(gp0))):
        assert a.shape == b.shape        # grads are in MODEL shapes
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=max(3e-6 * scale, 1e-7))


def test_stack_pair_path_matches_single(data, monkeypatch):
    """FusedBlockStack with SRCACO2_SWIN_PAIR=1 routes pairs through
    the fused pair kernel and matches the per-block path."""
    x, _, _ = data
    xs = x.reshape(B, H, W, C)
    m = FusedBlockStack(dim=C, depth=D, num_heads=NH, window_size=WS,
                        mlp_ratio=2.0, use_pallas='interpret')
    p = m.init(jax.random.key(0), xs)['params']
    y1 = m.apply({'params': p}, xs)
    monkeypatch.setenv('SRCACO2_SWIN_PAIR', '1')
    y2 = m.apply({'params': p}, xs)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                               atol=2e-6)


def test_f32_softmax_flag(data, monkeypatch):
    """SRCACO2_SWIN_F32_SOFTMAX routes the score/softmax chain in f32
    (torch-autocast numerics); with f32 compute dtype it must agree
    with the default path, and under bf16 it must still match its own
    oracle."""
    x, params, tables = data
    bias = build_attn_bias(tables, H, W, WS)
    base = fused_swin_block(x, params, bias[1], heads=NH,
                            interpret=True, compute_dtype=F32)
    monkeypatch.setenv('SRCACO2_SWIN_F32_SOFTMAX', '1')
    out_f = fused_swin_block(x, params, bias[1], heads=NH,
                             interpret=True, compute_dtype=F32)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(base),
                               atol=1e-6)
    monkeypatch.setenv('SRCACO2_SWIN_F32_SOFTMAX', '0')
    out_bf = fused_swin_block(x, params, bias[1], heads=NH,
                              interpret=True,
                              compute_dtype=jnp.bfloat16)
    ref_bf = swin_block_ref(x, params, bias[1], heads=NH,
                            compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out_bf), np.asarray(ref_bf),
                               atol=1e-5 + 2e-2 * float(
                                   jnp.max(jnp.abs(ref_bf))))


def test_f32_softmax_default_on(monkeypatch):
    """Round-4 regression (VERDICT r3 #10): the production default is
    the quality-correct f32 softmax chain (docs/QUALITY.md measured the
    bf16 chain at -0.45 dB for 0.6% throughput); bench.py opts back
    into bf16 explicitly."""
    from srcaco2_tpu.ops.pallas import swin_block as sb
    monkeypatch.delenv('SRCACO2_SWIN_F32_SOFTMAX', raising=False)
    assert sb._env_cfg().f32_softmax is True
    monkeypatch.setenv('SRCACO2_SWIN_F32_SOFTMAX', '0')
    assert sb._env_cfg().f32_softmax is False
    # bench.py pins the benchmark numerics to the bf16 chain
    import os
    src = open(os.path.join(os.path.dirname(__file__), '..',
                            'bench.py')).read()
    assert "setdefault('SRCACO2_SWIN_F32_SOFTMAX', '0')" in src


def test_bias_factorization_matches_gather():
    """The matmul-factorized bias build (no gathers/scatters) must be
    bitwise-equal to the naive table gather in the forward, and its
    autodiff table-gradient must agree with the native scatter-add
    gather gradient."""
    r = np.random.default_rng(3)
    d = 2
    tables = jnp.asarray(r.normal(0, 1, (d, (2 * WS - 1) ** 2, NH)),
                         F32)
    cot = jnp.asarray(r.normal(0, 1, (d, NH, T, T)), F32)

    def naive(tabs):
        outs = []
        for i in range(d):
            shift = 0 if i % 2 == 0 else WS // 2
            mask, rel = full_attn_mask_and_index(H, W, WS, shift)
            b = tabs[i][rel.reshape(-1)].reshape(T, T, NH)
            outs.append(b.transpose(2, 0, 1) + jnp.asarray(mask)[None])
        return jnp.stack(outs)

    got = build_attn_bias(tables, H, W, WS)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(naive(tables)))

    g_fact = jax.vjp(lambda t: build_attn_bias(t, H, W, WS),
                     tables)[1](cot)[0]
    g_native = jax.vjp(naive, tables)[1](cot)[0]
    np.testing.assert_allclose(np.asarray(g_fact),
                               np.asarray(g_native), rtol=2e-5,
                               atol=1e-4)


def test_module_pallas_matches_windowed_f32(data):
    x, _, _ = data
    xs = x.reshape(B, H, W, C)
    m_p = FusedBlockStack(C, D, NH, WS, 2.0, use_pallas='interpret')
    m_w = FusedBlockStack(C, D, NH, WS, 2.0, use_pallas='never')
    params = m_p.init(jax.random.key(0), xs)
    yp = m_p.apply(params, xs)
    yw = m_w.apply(params, xs)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yw),
                               atol=3e-6)

    gp = jax.grad(lambda p: jnp.sum(jnp.sin(m_p.apply(p, xs))))(params)
    gw = jax.grad(lambda p: jnp.sum(jnp.sin(m_w.apply(p, xs))))(params)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gw)):
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=max(3e-5 * scale, 3e-6))


def test_module_large_input_uses_windowed_path(monkeypatch):
    """Inputs above MAX_T tokens whose sides are not 2ws-tileable (or
    with tiling disabled) must run the windowed jnp path (eval)."""
    monkeypatch.setenv('SRCACO2_SWIN_TILED_EVAL', '0')
    xs = jnp.zeros((1, 24, 24, C), F32)   # 576 tokens > 256
    m = FusedBlockStack(C, 2, NH, WS, 2.0, use_pallas='interpret')
    params = m.init(jax.random.key(0), xs)
    out = m.apply(params, xs)             # would fail if pallas engaged
    assert out.shape == xs.shape


@pytest.mark.parametrize('hw', [(24, 16), (8, 48)])
def test_tiled_eval_matches_windowed(hw):
    """Full-image tiled fused path (2ws x 2ws tiles, grouped bias via
    scalar prefetch) == windowed jnp path, including the shift-wrap
    edge masks. (8, 48) exercises the single-tile-row case where the
    cyclic shift wraps within each tile."""
    h, w = hw
    r = np.random.default_rng(7)
    xs = jnp.asarray(r.normal(0, 1, (2, h, w, C)), F32)
    m_t = FusedBlockStack(C, D, NH, WS, 2.0, use_pallas='interpret',
                          allow_tiled=True)
    m_w = FusedBlockStack(C, D, NH, WS, 2.0, use_pallas='never')
    params = m_t.init(jax.random.key(0), xs)
    yt = m_t.apply(params, xs)            # t=h*w > MAX_T -> tiled
    yw = m_w.apply(params, xs)
    np.testing.assert_allclose(np.asarray(yt), np.asarray(yw),
                               atol=5e-6)


def test_train_grad_at_tileable_shape_falls_back():
    """The tiled kernel is forward-only; training (grad) at a
    full-image-like tileable shape must route to the differentiable
    windowed path instead of crashing on the missing VJP."""
    from srcaco2_tpu import constants
    from srcaco2_tpu.models.swinir import SwinIR
    m = SwinIR(in_chans=1, upscale=2, window_size=4, embed_dim=16,
               depths=(2,), num_heads=(2,), mlp_ratio=2.0,
               upsampler=constants.US_PIXEL_SHUFFLE_DIRECT,
               fused_blocks=True, fused_mode='interpret')
    x = jnp.ones((1, 1, 24, 24), F32) * 0.5   # 576 tokens, 2ws-tileable
    params = m.init(jax.random.key(0), x, train=False)['params']

    def loss(p):
        return jnp.mean(m.apply({'params': p}, x,
                                train=True)['out'] ** 2)
    g = jax.grad(loss)(params)
    assert all(jnp.all(jnp.isfinite(le)) for le in jax.tree.leaves(g))


def test_swinir_fused_integration():
    """SwinIR(fused_blocks=True) trains a step and evaluates at a
    different (large) shape with the same params."""
    from srcaco2_tpu import constants
    from srcaco2_tpu.models.swinir import SwinIR
    m = SwinIR(in_chans=1, upscale=2, window_size=4, embed_dim=16,
               depths=(2, 2), num_heads=(2, 2), mlp_ratio=2.0,
               upsampler=constants.US_PIXEL_SHUFFLE_DIRECT,
               fused_blocks=True, fused_mode='interpret')
    x = jnp.ones((2, 1, 8, 8), F32) * 0.5
    params = m.init(jax.random.key(0), x, train=False)['params']

    def loss(p):
        return jnp.mean(m.apply({'params': p}, x,
                                train=True)['out'] ** 2)
    g = jax.grad(loss)(params)
    assert all(jnp.all(jnp.isfinite(le)) for le in jax.tree.leaves(g))
    # eval at full-image shape (windowed path), same params
    big = jnp.ones((1, 1, 33, 29), F32) * 0.5
    out = m.apply({'params': params}, big, train=False)['out']
    assert out.shape == (1, 1, 66, 58)
