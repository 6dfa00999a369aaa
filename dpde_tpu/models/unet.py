"""Flax score networks (NHWC, TPU-native).

Re-design of the reference PyTorch models (reference:
src/diffusion_pde/models/nets.py) as flax.linen modules:

  * :class:`EDMUNet` — the "unet-v2" EDM-style UNet (<10M params at the
    reference hyperparameters; nets.py:217-341). Structure is preserved:
    sigma positional embedding -> 2-layer SiLU MLP to emb_dim, optional
    label embedding added; encoder = initial 3x3 conv then per-mult
    [down-ResBlock + num_res_blocks ResBlocks]; two mid ResBlocks at the
    deepest level; decoder mirrors with explicit skip-consuming blocks
    (the reference triggers concatenation by channel-count sniffing,
    nets.py:333-334 — here the skip structure is explicit); final
    GroupNorm + zero-init 3x3 conv. No attention, matching the reference.
  * :class:`SmallUnet` — the "unet-small" course model (nets.py:44-130).

TPU-first deviations (documented, capacity-neutral):
  * layout is NHWC (batch, H, W, C) so convs hit the MXU without layout
    transposes; callers converting reference NCHW data transpose at the IO
    boundary;
  * the up-ResBlock skip path uses nearest-neighbour x2 upsample + 1x1
    conv instead of the reference's stride-2 1x1 ConvTranspose
    (nets.py:144, which zero-stuffs odd pixels) — same parameter count,
    better-conditioned interpolation;
  * weight init: flax's lecun_normal equals torch's kaiming_normal
    fan_in/linear-gain used by the reference (nets.py:6-26); zero-init
    output convs are kept zero-init.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class PositionalEmbedding(nn.Module):
    """Sin/cos embedding of the (scalar) noise level (nets.py:29-42)."""

    num_channels: int
    max_positions: int = 10000
    endpoint: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        half = self.num_channels // 2
        freqs = jnp.arange(half, dtype=jnp.float32)
        freqs = freqs / (half - (1 if self.endpoint else 0))
        freqs = (1.0 / self.max_positions) ** freqs
        ang = x[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=1)


def _gn_groups(ch: int) -> int:
    """GroupNorm(32) when divisible, per-channel otherwise (nets.py:172-173)."""
    return 32 if ch >= 32 and ch % 32 == 0 else ch


class _ReflectConv(nn.Module):
    """Conv with explicit reflect padding then VALID conv — exactly the
    reference's pad(reflect) + Conv2d semantics incl. the stride-2 case
    (nets.py:133-150)."""

    features: int
    kernel: int
    down: bool = False
    zero_init: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = (self.kernel - 1) // 2
        if pad > 0:
            x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                        mode="reflect")
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(2, 2) if self.down else (1, 1),
            padding="VALID",
            kernel_init=nn.initializers.zeros if self.zero_init
            else nn.initializers.lecun_normal(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv",
        )(x)


def _conv(features: int, kernel: int, *, down: bool = False,
          zero_init: bool = False, dtype=None,
          name: str | None = None) -> _ReflectConv:
    return _ReflectConv(features, kernel, down=down, zero_init=zero_init,
                        dtype=dtype, name=name)


def _upsample2(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest x2 upsample as broadcast+reshape. Equivalent to
    jax.image.resize(..., method="nearest") at integer scale, but lowers
    to a copy instead of a GATHER — the resize gather was ~2% of device
    time in the round-5 sampler trace (runs_r5/profile_x0_i4)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class _PallasGNSiLU(nn.Module):
    """GroupNorm + SiLU through the fused Pallas kernel
    (ops/pallas/groupnorm.py). Parameter names/shapes/init match
    ``nn.GroupNorm`` exactly, so checkpoints are interchangeable with the
    XLA path."""

    num_groups: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.pallas.groupnorm import groupnorm_silu

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return groupnorm_silu(x, scale, bias, self.num_groups,
                              self.epsilon)


class ResBlock(nn.Module):
    """EDM-style residual block (nets.py:153-211):
    GN -> SiLU -> conv (stride/upsample variants) -> +emb -> GN -> SiLU ->
    dropout -> zero-init conv -> +skip, all scaled by 1/sqrt(2).

    ``train`` is a module attribute (not a call arg) so the block can be
    wrapped in ``nn.remat`` with purely-array call args — the remat unit
    for memory-bound training (see EDMUNet.remat)."""

    out_ch: int
    up: bool = False
    down: bool = False
    dropout: float = 0.0
    skip_scale: float = 2 ** -0.5
    dtype: jnp.dtype | None = None
    train: bool = False
    pallas_gn: bool = False

    def _gn_silu(self, x, name):
        if self.pallas_gn:
            return _PallasGNSiLU(num_groups=_gn_groups(x.shape[-1]),
                                 name=name)(x)
        return nn.silu(nn.GroupNorm(num_groups=_gn_groups(x.shape[-1]),
                                    epsilon=1e-5, dtype=self.dtype,
                                    name=name)(x))

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
        train = self.train
        in_ch = x.shape[-1]
        dt = self.dtype
        orig = x
        h = self._gn_silu(x, "norm1")
        if self.up:
            h = nn.ConvTranspose(self.out_ch, (3, 3), strides=(2, 2),
                                 padding="SAME",
                                 kernel_init=nn.initializers.lecun_normal(),
                                 dtype=dt, name="conv1")(h)
        elif self.down:
            h = _conv(self.out_ch, 3, down=True, dtype=dt, name="conv1")(h)
        else:
            h = _conv(self.out_ch, 3, dtype=dt, name="conv1")(h)

        e = nn.Dense(self.out_ch, dtype=dt, name="emb_layer")(emb)
        h = h + e[:, None, None, :]

        h = self._gn_silu(h, "norm2")
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = _conv(self.out_ch, 3, zero_init=True, dtype=dt, name="conv2")(h)

        if in_ch != self.out_ch or self.up or self.down:
            if self.up:
                orig = _conv(self.out_ch, 1, dtype=dt,
                             name="skip")(_upsample2(orig))
            elif self.down:
                orig = _conv(self.out_ch, 1, down=True, dtype=dt,
                             name="skip")(orig)
            else:
                orig = _conv(self.out_ch, 1, dtype=dt, name="skip")(orig)
        h = h + (orig.astype(dt) if dt is not None else orig)
        return h * jnp.asarray(self.skip_scale, h.dtype)


class EDMUNet(nn.Module):
    """The "unet-v2" model (nets.py:217-341). Input NHWC.

    ``dtype``: activation/compute dtype (params stay float32). bfloat16
    roughly halves HBM traffic of the bandwidth-bound forward on TPU; the
    EDM preconditioner keeps its scaling math in float32 either way.
    """

    img_channels: int
    obs_channels: int = 0
    label_dim: int = 0
    base_channels: int = 64
    channel_mults: Sequence[int] = (1, 2, 2)
    num_res_blocks: int = 2
    dropout: float = 0.0
    sigma_emb_dim: int = 64
    emb_dim: int = 256
    dtype: jnp.dtype | None = None
    remat: bool = False
    pallas_gn: bool = False   # fused Pallas GroupNorm+SiLU in ResBlocks
    # (ops/pallas/groupnorm.py); param pytree identical either way

    @nn.compact
    def __call__(self, x: jnp.ndarray, sigma: jnp.ndarray,
                 labels: jnp.ndarray | None = None,
                 obs: jnp.ndarray | None = None, *,
                 train: bool = False) -> jnp.ndarray:
        if obs is not None and self.obs_channels > 0:
            assert obs.shape[-1] == self.obs_channels, (
                f"expected obs with {self.obs_channels} channels, "
                f"got {obs.shape[-1]}")
            x = jnp.concatenate([x, obs], axis=-1)
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)

        # sigma/label embedding path runs in float32 (tiny, and log-sigma
        # resolution matters), then casts once into the compute dtype
        emb = PositionalEmbedding(self.sigma_emb_dim,
                                  name="sigma_embed")(sigma)
        emb = nn.Dense(self.emb_dim, name="time_mlp_0")(emb)
        emb = nn.Dense(self.emb_dim, name="time_mlp_1")(nn.silu(emb))
        if self.label_dim > 0 and labels is not None:
            emb = emb + nn.Dense(self.emb_dim, name="label_embed")(labels)
        if dt is not None:
            emb = emb.astype(dt)

        mults = tuple(self.channel_mults)
        nrb = self.num_res_blocks
        # per-block rematerialisation: backward recomputes one block's
        # forward at a time, so the live activation set drops from every
        # intermediate in the net to the block boundaries (+1 block) —
        # the standard trade for memory-bound training; param pytree is
        # unchanged, so remat and no-remat checkpoints are interchangeable
        RB = (nn.remat(ResBlock, prevent_cse=False) if self.remat
              else ResBlock)
        if self.pallas_gn:
            from functools import partial as _partial

            RB = _partial(RB, pallas_gn=True)

        # ---------------- encoder ----------------
        skips = []
        for i, mult in enumerate(mults):
            out_ch = self.base_channels * mult
            if i == 0:
                x = _conv(out_ch, 3, dtype=dt, name="enc_in")(x)
            else:
                x = RB(out_ch, down=True, dropout=self.dropout,
                       dtype=dt, train=train,
                       name=f"enc_{i}_down")(x, emb)
            skips.append(x)
            for j in range(nrb):
                x = RB(out_ch, dropout=self.dropout, dtype=dt,
                       train=train, name=f"enc_{i}_res{j}")(x, emb)
                skips.append(x)

        # ---------------- decoder ----------------
        for i in reversed(range(len(mults))):
            out_ch = self.base_channels * mults[i]
            if i == len(mults) - 1:
                x = RB(out_ch, dropout=self.dropout, dtype=dt,
                       train=train, name=f"dec_{i}_mid0")(x, emb)
                x = RB(out_ch, dropout=self.dropout, dtype=dt,
                       train=train, name=f"dec_{i}_mid1")(x, emb)
            else:
                x = RB(x.shape[-1], up=True, dropout=self.dropout,
                       dtype=dt, train=train,
                       name=f"dec_{i}_up")(x, emb)
            for j in range(nrb + 1):
                x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = RB(out_ch, dropout=self.dropout, dtype=dt,
                       train=train, name=f"dec_{i}_res{j}")(x, emb)
        assert not skips

        x = nn.GroupNorm(num_groups=_gn_groups(x.shape[-1]), epsilon=1e-5,
                         dtype=dt, name="final_norm")(x)
        out = _conv(self.img_channels, 3, zero_init=True, dtype=dt,
                    name="final_conv")(x)
        return out.astype(jnp.float32)


class SmallUnet(nn.Module):
    """The "unet-small" course model (nets.py:44-130): plain conv encoder
    with MaxPool downs, ConvTranspose ups, per-level embedding adds."""

    chs: Sequence[int]          # (ch_1, ..., ch_n) — excludes input channels
    label_dim: int = 0
    noise_ch: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, sigma: jnp.ndarray,
                 labels: jnp.ndarray | None = None,
                 obs: jnp.ndarray | None = None, *,
                 train: bool = False) -> jnp.ndarray:
        del obs  # unet-small takes no obs input (utils.py:45-47)
        in_ch = x.shape[-1]
        chs = tuple(self.chs)
        n = len(chs)

        emb = PositionalEmbedding(self.noise_ch, name="sigma_embedding")(sigma)
        if self.label_dim > 0 and labels is not None:
            emb = emb + nn.Dense(self.noise_ch, name="linear_label")(labels)
        embs = [nn.Dense(c, name=f"linear_embed_{i}")(emb)
                for i, c in enumerate(chs)]

        signal = x
        saved = []
        for i, c in enumerate(chs):
            if i != 0:
                signal = nn.max_pool(signal, (2, 2), strides=(2, 2))
            signal = nn.silu(_conv(c, 3, name=f"down_{i}")(signal))
            signal = signal + embs[i][:, None, None, :]
            if i < n - 1:
                saved.append(signal)

        for k, i in enumerate(range(n - 1, 0, -1)):
            if k > 0:
                signal = jnp.concatenate([signal, saved[-k]], axis=-1)
            tgt = chs[i - 1] if i > 1 else chs[0]
            signal = nn.silu(nn.ConvTranspose(
                tgt, (3, 3), strides=(2, 2), padding="SAME",
                name=f"up_{k}")(signal))
            if k < n - 2:
                signal = signal + embs[i - 1][:, None, None, :]
        # final level: cat last skip, 1x stride transpose-ish conv + out conv
        signal = jnp.concatenate([signal, saved[0]], axis=-1) \
            if saved else signal
        signal = nn.silu(_conv(chs[0], 3, name="up_final")(signal))
        return _conv(in_ch, 3, name="out_conv")(signal)
