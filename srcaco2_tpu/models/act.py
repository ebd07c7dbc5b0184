"""ACT: aggregated CNN-transformer network (dual branch + fusion).

Capability parity with the reference (network_act.py:321): RCAN-style CNN
branch (n_resgroups ResidualGroups of RCABs with channel attention) runs
in parallel with a token transformer branch (3x3-token MHSA +
cross-scale token attention between small 3x3 and large 6x6 overlapping
tokens); n_fusionblocks fusion stages exchange information via 1x1
fusion blocks, MLP and conv refiners; pixel-shuffle tail.
"""
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from srcaco2_tpu.models.blocks import (Conv, Upsampler, nchw_to_nhwc,
                                       nhwc_to_nchw)
from srcaco2_tpu.ops.patches import (fold_k2s, fold_nonoverlap,
                                     unfold_k2s, unfold_nonoverlap)

Dtype = Any


class CALayer(nn.Module):
    channel: int
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = x.mean(axis=(1, 2), keepdims=True)
        y = nn.relu(Conv(self.channel // self.reduction, 1,
                         dtype=self.dtype)(y))
        y = nn.sigmoid(Conv(self.channel, 1, dtype=self.dtype)(y))
        return x * y


class RCAB(nn.Module):
    n_feat: int
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.relu(Conv(self.n_feat, 3, dtype=self.dtype)(x))
        y = Conv(self.n_feat, 3, dtype=self.dtype)(y)
        y = CALayer(self.n_feat, self.reduction, dtype=self.dtype)(y)
        return x + y


class ResidualGroup(nn.Module):
    n_feat: int
    n_resblocks: int
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = x
        for _ in range(self.n_resblocks):
            y = RCAB(self.n_feat, self.reduction, dtype=self.dtype)(y)
        y = Conv(self.n_feat, 3, dtype=self.dtype)(y)
        return x + y


def _mhsa(x, dim, heads, dim_head, dtype, name_dense):
    inner = heads * dim_head
    qkv = nn.Dense(3 * inner, use_bias=False, dtype=dtype,
                   name=f'{name_dense}_qkv')(x)
    b, n, _ = x.shape
    qkv = qkv.reshape(b, n, 3, heads, dim_head).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = jax.nn.softmax(
        jnp.einsum('bhnd,bhmd->bhnm', q * dim_head ** -0.5, k), axis=-1)
    out = jnp.einsum('bhnm,bhmd->bhnd', attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
    return nn.Dense(dim, dtype=dtype, name=f'{name_dense}_out')(out)


class SelfAttnBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(dtype=self.dtype)(x)
        x = _mhsa(y, self.dim, self.heads, self.dim_head, self.dtype,
                  'sa') + x
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.Dense(self.hidden, dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype)(y)
        return x + y


class CrossAttn(nn.Module):
    dim: int
    heads: int
    dim_head: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_q, x_kv):
        xq = nn.LayerNorm(dtype=self.dtype)(x_q)
        xkv = nn.LayerNorm(dtype=self.dtype)(x_kv)
        inner = self.heads * self.dim_head
        b, nq, _ = xq.shape
        nk = xkv.shape[1]
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype)(xq)
        kv = nn.Dense(2 * inner, use_bias=False, dtype=self.dtype)(xkv)
        q = q.reshape(b, nq, self.heads, self.dim_head
                      ).transpose(0, 2, 1, 3)
        kv = kv.reshape(b, nk, 2, self.heads, self.dim_head
                        ).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        attn = jax.nn.softmax(
            jnp.einsum('bhnd,bhmd->bhnm', q * self.dim_head ** -0.5, k),
            axis=-1)
        out = jnp.einsum('bhnm,bhmd->bhnd', attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, nq, inner)
        return nn.Dense(self.dim, dtype=self.dtype)(out)


class ACT(nn.Module):
    in_chans: int = 1
    upscale: int = 2
    n_feats: int = 64
    n_resgroups: int = 4
    n_resblocks: int = 12
    reduction: int = 16
    n_heads: int = 8
    n_layers: int = 8
    n_fusionblocks: int = 4
    token_size: int = 3
    expansion_ratio: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ts = self.token_size
        nf = self.n_feats
        emb = nf * ts * ts
        hidden = emb * self.expansion_ratio
        dim_head = emb // self.n_heads

        y = nchw_to_nhwc(x)
        h, w = y.shape[1], y.shape[2]
        y = Conv(nf, 3, dtype=self.dtype)(y)
        for _ in range(2):
            r = nn.relu(Conv(nf, 5, dtype=self.dtype)(y))
            y = y + Conv(nf, 5, dtype=self.dtype)(r)
        identity = y

        tkn = unfold_nonoverlap(y, ts)                 # (B, T, emb)
        tkn = nn.Dense(emb, dtype=self.dtype,
                       name='linear_encoding')(tkn) + tkn

        f = None
        for i in range(self.n_fusionblocks):
            tkn = SelfAttnBlock(emb, self.n_heads, dim_head, hidden,
                                dtype=self.dtype, name=f'mhsa{i}')(tkn)
            tkn_a, tkn_b = jnp.split(tkn, 2, axis=-1)

            # large overlapping tokens from the b-half
            img_b = fold_nonoverlap(tkn_b, ts, (h, w))
            big = unfold_k2s(img_b, ts)                # (B, T2, emb*2)
            big = nn.LayerNorm(dtype=self.dtype)(big)
            big = nn.Dense(emb // 2, dtype=self.dtype)(big)
            big = nn.gelu(big)
            big = nn.Dense(emb // 2, dtype=self.dtype)(big)

            a2 = CrossAttn(emb // 2, self.n_heads // 2, dim_head,
                           dtype=self.dtype,
                           name=f'cross_a{i}')(tkn_a, big) + tkn_a
            b2 = CrossAttn(emb // 2, self.n_heads // 2, dim_head,
                           dtype=self.dtype,
                           name=f'cross_b{i}')(big, tkn_a) + big
            b2 = nn.LayerNorm(dtype=self.dtype)(b2)
            b2 = nn.Dense(emb // 2, dtype=self.dtype)(b2)
            b2 = nn.gelu(b2)
            b2 = nn.Dense(emb * 2, dtype=self.dtype)(b2)
            img_b2 = fold_k2s(b2, ts, (h, w))          # overlap-add
            tkn_b2 = unfold_nonoverlap(img_b2, ts)

            tkn = jnp.concatenate([a2, tkn_b2], axis=-1)
            z = nn.LayerNorm(dtype=self.dtype)(tkn)
            z = nn.Dense(hidden, dtype=self.dtype)(z)
            z = nn.gelu(z)
            z = nn.Dense(emb, dtype=self.dtype)(z)
            tkn = tkn + z

            # (the reference indexes cnn_branch[i], so its trailing conv
            # module is never executed — mirrored here.)
            y = ResidualGroup(nf, self.n_resblocks, self.reduction,
                              dtype=self.dtype, name=f'rg{i}')(y)

            tkn_res, y_res = tkn, y
            tkn_img = fold_nonoverlap(tkn, ts, (h, w))
            f = jnp.concatenate([y, tkn_img], axis=-1)
            fb = f
            for j in range(4):
                # FB 1x1 convs are BIAS-FREE (network_act.py:305)
                r = nn.relu(Conv(2 * nf, 1, use_bias=False,
                                 dtype=self.dtype,
                                 name=f'fb{i}_{j}a')(fb))
                fb = fb + Conv(2 * nf, 1, use_bias=False,
                               dtype=self.dtype,
                               name=f'fb{i}_{j}b')(r)
            f = f + fb

            if i != self.n_fusionblocks - 1:
                tkn_img2, y = jnp.split(f, 2, axis=-1)
                tkn = unfold_nonoverlap(tkn_img2, ts)
                z = nn.LayerNorm(dtype=self.dtype)(tkn)
                z = nn.Dense(hidden, dtype=self.dtype)(z)
                z = nn.gelu(z)
                z = nn.Dense(emb, dtype=self.dtype)(z)
                tkn = z + tkn_res
                y = Conv(nf, 3, dtype=self.dtype)(
                    nn.relu(Conv(nf, 3, dtype=self.dtype)(y))) + y_res

        out = Conv(nf, 3, dtype=self.dtype, name='conv_last')(f)
        out = out + identity
        out = Upsampler(self.upscale, nf, dtype=self.dtype)(out)
        out = Conv(self.in_chans, 3, dtype=self.dtype)(out)
        return {'out': nhwc_to_nchw(out)}
