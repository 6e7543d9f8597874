"""U-Net denoiser for the continuous DDPM.

Counterpart of /root/reference/examples/unet.py: sinusoidal time embedding
(unet.py:43-52), ResNet blocks with group normalisation, self-attention at low
resolution (unet.py:56-91), and down/up sampling. Convolutions are NHWC
``lax.conv_general_dilated`` so XLA lays them out for the MXU; attention is a
single fused einsum chain.
"""

import math

import jax
import jax.numpy as jnp

from .layers import Linear
from ..utils.module import Module


class Conv2d(Module):
    def __init__(self, key, in_ch, out_ch, ksize=3, stride=1, dtype=jnp.float32):
        scale = 1.0 / math.sqrt(in_ch * ksize * ksize)
        k1, k2 = jax.random.split(key)
        self.w = jax.random.uniform(k1, (ksize, ksize, in_ch, out_ch), dtype,
                                    -scale, scale)
        self.b = jax.random.uniform(k2, (out_ch,), dtype, -scale, scale)
        self.stride = stride
        self.ksize = ksize

    def __call__(self, x):  # x: (B, H, W, C)
        pad = self.ksize // 2
        out = jax.lax.conv_general_dilated(
            x, self.w, window_strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + self.b


class GroupNorm(Module):
    def __init__(self, channels, groups=8, dtype=jnp.float32):
        self.scale = jnp.ones((channels,), dtype)
        self.bias = jnp.zeros((channels,), dtype)
        self.groups = min(groups, channels)

    def __call__(self, x):  # (B, H, W, C)
        B, H, W, C = x.shape
        g = self.groups
        xg = x.reshape(B, H, W, g, C // g)
        mean = xg.mean(axis=(1, 2, 4), keepdims=True)
        var = xg.var(axis=(1, 2, 4), keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + 1e-5)
        return xg.reshape(B, H, W, C) * self.scale + self.bias


def sinusoidal_embedding(t, dim):
    """(B,) -> (B, dim) sinusoidal time embedding (reference unet.py:43-52)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half) / (half - 1))
    args = t[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)


class ResBlock(Module):
    def __init__(self, key, in_ch, out_ch, time_dim, dtype=jnp.float32):
        ks = jax.random.split(key, 4)
        self.norm1 = GroupNorm(in_ch, dtype=dtype)
        self.conv1 = Conv2d(ks[0], in_ch, out_ch, dtype=dtype)
        self.time_proj = Linear(ks[1], time_dim, out_ch, dtype)
        self.norm2 = GroupNorm(out_ch, dtype=dtype)
        self.conv2 = Conv2d(ks[2], out_ch, out_ch, dtype=dtype)
        self.skip = (Conv2d(ks[3], in_ch, out_ch, ksize=1, dtype=dtype)
                     if in_ch != out_ch else None)

    def __call__(self, x, temb):
        h = self.conv1(jax.nn.silu(self.norm1(x)))
        h = h + self.time_proj(jax.nn.silu(temb))[:, None, None, :]
        h = self.conv2(jax.nn.silu(self.norm2(h)))
        skip = self.skip(x) if self.skip is not None else x
        return h + skip


class SelfAttention2d(Module):
    def __init__(self, key, channels, dtype=jnp.float32):
        ks = jax.random.split(key, 2)
        self.norm = GroupNorm(channels, dtype=dtype)
        self.qkv = Conv2d(ks[0], channels, 3 * channels, ksize=1, dtype=dtype)
        self.proj = Conv2d(ks[1], channels, channels, ksize=1, dtype=dtype)
        self.channels = channels

    def __call__(self, x):
        B, H, W, C = x.shape
        qkv = self.qkv(self.norm(x)).reshape(B, H * W, 3, C)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jax.nn.softmax(jnp.einsum("bic,bjc->bij", q, k) / math.sqrt(C), axis=-1)
        out = jnp.einsum("bij,bjc->bic", attn, v).reshape(B, H, W, C)
        return x + self.proj(out)


class Downsample(Module):
    def __init__(self, key, channels, dtype=jnp.float32):
        self.conv = Conv2d(key, channels, channels, ksize=3, stride=2, dtype=dtype)

    def __call__(self, x):
        return self.conv(x)


class Upsample(Module):
    def __init__(self, key, channels, dtype=jnp.float32):
        self.conv = Conv2d(key, channels, channels, ksize=3, dtype=dtype)

    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")
        return self.conv(x)


class UNet(Module):
    """Compact U-Net: channel multipliers per resolution, ResBlocks, attention
    at the lowest resolution, additive skip connections."""

    def __init__(self, key, in_ch=1, base_ch=32, ch_mults=(1, 2, 2),
                 attn_level=-1, dtype=jnp.float32):
        time_dim = base_ch * 4
        ks = iter(jax.random.split(key, 64))
        self.time_mlp1 = Linear(next(ks), base_ch, time_dim, dtype)
        self.time_mlp2 = Linear(next(ks), time_dim, time_dim, dtype)
        self.base_ch = base_ch

        self.conv_in = Conv2d(next(ks), in_ch, base_ch, dtype=dtype)
        chans = [base_ch * m for m in ch_mults]
        self.down_blocks = []
        self.downs = []
        prev = base_ch
        for i, ch in enumerate(chans):
            self.down_blocks.append(ResBlock(next(ks), prev, ch, time_dim, dtype))
            self.downs.append(Downsample(next(ks), ch, dtype)
                              if i < len(chans) - 1 else None)
            prev = ch

        self.mid_block1 = ResBlock(next(ks), prev, prev, time_dim, dtype)
        self.mid_attn = SelfAttention2d(next(ks), prev, dtype)
        self.mid_block2 = ResBlock(next(ks), prev, prev, time_dim, dtype)

        self.up_blocks = []
        self.ups = []
        for i, ch in reversed(list(enumerate(chans))):
            self.up_blocks.append(ResBlock(next(ks), prev + ch, ch, time_dim, dtype))
            self.ups.append(Upsample(next(ks), ch, dtype) if i > 0 else None)
            prev = ch

        self.norm_out = GroupNorm(prev, dtype=dtype)
        self.conv_out = Conv2d(next(ks), prev, in_ch, dtype=dtype)

    def __call__(self, t, x):
        """t: (B,) times; x: (B, C, H, W) (torch layout, reference parity) or
        (B, H, W, C). Returns same layout as input."""
        chw = x.shape[1] < x.shape[-1] or x.shape[1] <= 4
        if chw:  # NCHW -> NHWC
            x = jnp.transpose(x, (0, 2, 3, 1))
        # Embed time in f32 regardless of the net's param dtype: the t*freqs
        # products quantize badly in bf16, and the embedding is (B, base_ch)
        # scalars — casting after costs nothing.
        temb = sinusoidal_embedding(t.astype(jnp.float32), self.base_ch)
        temb = temb.astype(self.time_mlp1.w.dtype)
        temb = self.time_mlp2(jax.nn.silu(self.time_mlp1(temb)))

        h = self.conv_in(x)
        skips = []
        for block, down in zip(self.down_blocks, self.downs):
            h = block(h, temb)
            skips.append(h)
            if down is not None:
                h = down(h)

        h = self.mid_block1(h, temb)
        h = self.mid_attn(h)
        h = self.mid_block2(h, temb)

        for block, up in zip(self.up_blocks, self.ups):
            h = jnp.concatenate([h, skips.pop()], axis=-1)
            h = block(h, temb)
            if up is not None:
                h = up(h)

        out = self.conv_out(jax.nn.silu(self.norm_out(h)))
        if chw:
            out = jnp.transpose(out, (0, 3, 1, 2))
        return out
