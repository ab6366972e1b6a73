"""Neural model family consuming voxel-grid batches.

The reference keeps networks in sibling repos (reference README.md:153
points at event_cnn_minimal); this framework ships compact flax versions of
the two architectures its data pipeline exists to feed (BASELINE config 5):

- ``EVFlowNet``  — encoder-decoder optical-flow net (Zhu et al., EV-FlowNet)
  trained self-supervised with the contrast-maximisation loss this
  framework computes natively.
- ``E2VID``      — recurrent encoder-decoder intensity reconstruction net
  (Rebecq et al., E2VID) with ConvGRU state.

Both take ``(B, C, H, W)`` voxel grids (C = 2*num_bins polarity-split or
num_bins combined, exactly what ``BaseVoxelDataset``/``NativeWindowedLoader``
emit) and are sized so tp/pp-free data parallelism over the batch axis is
the right sharding (these are small convnets; the batch dimension is where
the scale is — see parallel/sharding.py).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def _conv(features, kernel=3, stride=1):
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding="SAME")


def _check_divisible(hw, depth, name):
    """Fail loudly on spatial dims the stride-2 pyramid cannot round-trip —
    otherwise the decoder silently drops skip connections and returns a
    differently-shaped output."""
    H, W = int(hw[0]), int(hw[1])
    d = 2 ** depth
    if H % d or W % d:
        from ..errors import ConfigurationError
        raise ConfigurationError(
            f"{name}: input {H}x{W} not divisible by 2^depth={d}; pad with "
            "utils.util.CropParameters first")


class ConvGRU(nn.Module):
    """Convolutional GRU cell (the E2VID recurrent state)."""

    features: int

    @nn.compact
    def __call__(self, h, x):
        if h is None:
            h = jnp.zeros(x.shape[:-1] + (self.features,), x.dtype)
        zr = nn.sigmoid(_conv(2 * self.features)(jnp.concatenate([x, h], -1)))
        z, r = jnp.split(zr, 2, axis=-1)
        cand = nn.tanh(_conv(self.features)(jnp.concatenate([x, r * h], -1)))
        return (1 - z) * h + z * cand


class _Encoder(nn.Module):
    features: Sequence[int]

    @nn.compact
    def __call__(self, x):
        skips = []
        for f in self.features:
            x = nn.relu(_conv(f, kernel=3, stride=2)(x))
            skips.append(x)
        return x, skips


class _ResBlock(nn.Module):
    """Pre-activation residual conv block (E2VID bottleneck stack)."""

    features: int

    @nn.compact
    def __call__(self, x):
        h = _conv(self.features)(nn.relu(x))
        h = _conv(self.features)(nn.relu(h))
        return x + h


class _Decoder(nn.Module):
    features: Sequence[int]
    out_channels: int

    @nn.compact
    def __call__(self, x, skips):
        for f, skip in zip(self.features, reversed(skips[:-1])):
            B, H, W, C = x.shape
            x = jax.image.resize(x, (B, H * 2, W * 2, C), "bilinear")
            x = nn.relu(_conv(f)(x))
            if skip.shape[1:3] == x.shape[1:3]:
                x = jnp.concatenate([x, skip], axis=-1)
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), "bilinear")
        return _conv(self.out_channels)(x)


class EVFlowNet(nn.Module):
    """Encoder-decoder optical flow from voxel grids.

    Input  ``(B, C, H, W)`` voxel grid (H, W multiples of 2^depth — use
    ``utils.util.CropParameters`` to pad arbitrary sensors).
    Output ``(B, 2, H, W)`` flow field (u, v) in px/s.
    """

    base_features: int = 32
    depth: int = 3

    @nn.compact
    def __call__(self, voxel):
        _check_divisible(voxel.shape[-2:], self.depth, "EVFlowNet")
        x = jnp.transpose(voxel, (0, 2, 3, 1))  # NCHW -> NHWC
        feats = [self.base_features * (2 ** i) for i in range(self.depth)]
        x, skips = _Encoder(feats)(x)
        x = nn.relu(_conv(feats[-1])(x))
        flow = _Decoder(list(reversed(feats[:-1])) or [self.base_features],
                        2)(x, skips)
        return jnp.transpose(flow, (0, 3, 1, 2)) * 10.0  # flow-scale init


class E2VID(nn.Module):
    """Recurrent intensity reconstruction from voxel grids.

    ``apply(params, voxel, state) -> (image (B, 1, H, W) in [0, 1], state)``.
    Pass ``state=None`` for the first window of a sequence.

    ``recurrent_levels`` controls where ConvGRU state lives: 1 (default)
    keeps a single GRU at the bottleneck (and the historical parameter
    tree, so existing checkpoints restore unchanged); ``k > 1`` adds a GRU
    after each of the ``k`` deepest encoder levels — the full E2VID design
    (Rebecq et al. recur at every level), which retains fine spatial detail
    across windows instead of re-estimating it from each window's events.
    State is then a ``k``-tuple (shallowest-recurrent first).
    ``num_res_blocks`` stacks pre-activation residual blocks at the
    bottleneck (the reference architecture uses 2).
    """

    base_features: int = 32
    depth: int = 3
    recurrent_levels: int = 1
    num_res_blocks: int = 0

    @nn.compact
    def __call__(self, voxel, state=None):
        _check_divisible(voxel.shape[-2:], self.depth, "E2VID")
        if not 1 <= self.recurrent_levels <= self.depth:
            from ..errors import ConfigurationError
            raise ConfigurationError(
                f"E2VID: recurrent_levels={self.recurrent_levels} must be "
                f"in [1, depth={self.depth}]")
        x = jnp.transpose(voxel, (0, 2, 3, 1))
        feats = [self.base_features * (2 ** i) for i in range(self.depth)]
        if self.recurrent_levels == 1:
            x, skips = _Encoder(feats)(x)
            gru = ConvGRU(feats[-1])
            state = gru(state, x)
            bottleneck = state
        else:
            first_rec = self.depth - self.recurrent_levels
            states_in = ((None,) * self.recurrent_levels if state is None
                         else tuple(state))
            skips, new_states = [], []
            for i, f in enumerate(feats):
                x = nn.relu(_conv(f, kernel=3, stride=2)(x))
                if i >= first_rec:
                    x = ConvGRU(f)(states_in[i - first_rec], x)
                    new_states.append(x)
                skips.append(x)
            state = tuple(new_states)
            bottleneck = x
        for _ in range(self.num_res_blocks):
            bottleneck = _ResBlock(feats[-1])(bottleneck)
        x = nn.relu(_conv(feats[-1])(bottleneck))
        img = _Decoder(list(reversed(feats[:-1])) or [self.base_features],
                       1)(x, skips)
        img = nn.sigmoid(jnp.transpose(img, (0, 3, 1, 2)))
        return img, state


# ---------------------------------------------------------------------------
# Self-supervised losses (the framework's native training signals)
# ---------------------------------------------------------------------------

def contrast_flow_loss(flow, events, events_mask, sensor_size,
                       blur_sigma: float = 1.0,
                       smoothness_weight: float = 0.5):
    """Self-supervised EV-FlowNet loss: warp the raw events of each window by
    the predicted dense flow and maximise IWE contrast (variance), plus a
    total-variation smoothness prior on the flow.

    The warp runs with the *compensating* sign (``-flow`` through
    `warp_events_flow`, whose reference-faithful formula advects events
    backward — see its docstring), so the trained network emits TRUE
    forward optic flow: positive (u, v) px/s for a scene moving in +x/+y,
    the same convention as the simulator's ground truth and the velocities
    `contrast_max` recovers. (Before this was pinned, training converged to
    the negated field: loss(-gt) beat loss(+gt) on simulated GT.)

    @param flow ``(B, 2, H, W)`` predicted flow
    @param events ``(B, N, 4)`` padded raw events (x, y, t, p)
    @param events_mask ``(B, N)`` validity
    """
    from ..ops.blur import gaussian_blur_image
    from ..ops.scatter import bilinear_scatter
    from ..transforms.optic_flow import warp_events_flow

    H, W = sensor_size

    def one(flow_b, ev, mask):
        xs, ys, ts, ps = ev[:, 0], ev[:, 1], ev[:, 2], ev[:, 3]
        # default t0 (last valid event; empty windows fall back finitely)
        xw, yw = warp_events_flow(xs, ys, ts, ps, -flow_b, mask=mask)
        valid = ((xw >= 0) & (xw < W) & (yw >= 0) & (yw < H)
                 & (mask != 0))
        iwe = bilinear_scatter(xw, yw, ps * mask, (H, W), mask=valid)
        iwe = gaussian_blur_image(iwe, blur_sigma)
        return -jnp.var(iwe)

    contrast = jnp.mean(jax.vmap(one)(flow, events, events_mask))
    tv = (jnp.mean(jnp.abs(jnp.diff(flow, axis=-1)))
          + jnp.mean(jnp.abs(jnp.diff(flow, axis=-2))))
    return contrast + smoothness_weight * tv


def _perceptual_pyramid(img, key, levels: int = 3, features: int = 16):
    """Fixed random-conv feature pyramid for the perceptual loss.

    Filters are drawn once from a fixed PRNG key (constant-folded under
    jit): randomly-initialized conv features are an effective perceptual
    metric without pretrained weights (Amir & Weiss, "Understanding and
    Simplifying Perceptual Distances", CVPR'21) — the right trade in an
    offline environment where LPIPS's VGG weights are unavailable.
    """
    feats = []
    x = img
    in_ch = img.shape[1]
    for lvl in range(levels):
        key, sub = jax.random.split(key)
        w = jax.random.normal(sub, (features, in_ch, 3, 3), jnp.float32)
        w = w / jnp.sqrt(9.0 * in_ch)
        x = jax.lax.conv_general_dilated(
            x, w, (2, 2), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = jax.nn.relu(x)
        # unit-normalize channels like LPIPS before comparing
        feats.append(x / (jnp.linalg.norm(x, axis=1, keepdims=True) + 1e-8))
        in_ch = features
    return feats


def perceptual_distance(pred, target, levels: int = 3, features: int = 16,
                        seed: int = 0):
    """LPIPS-style distance with fixed random features (see
    ``_perceptual_pyramid``). Inputs ``(B, 1, H, W)`` in [0, 1]."""
    key = jax.random.PRNGKey(seed)
    fp = _perceptual_pyramid(pred, key, levels, features)
    ft = _perceptual_pyramid(target, key, levels, features)
    return sum(jnp.mean((a - b) ** 2) for a, b in zip(fp, ft)) / len(fp)


def reconstruction_loss(pred, target, lpips_weight: float = 0.0,
                        mse_weight: float = 0.0):
    """E2VID supervision: L1 + optional random-feature perceptual term
    (the reference repo trains its networks elsewhere; this is the
    framework-native equivalent of the L1+LPIPS loss those repos use).
    ``mse_weight`` adds a squared-error term — PSNR is a log-MSE metric,
    so a PSNR-targeted fine-tune stage weights it in (typical ~4.0: MSE
    gradients on [0,1] images are ~0.1x L1's, so 4.0 makes the two terms
    comparable)."""
    loss = jnp.mean(jnp.abs(pred - target))
    if mse_weight:
        loss = loss + mse_weight * jnp.mean(jnp.square(pred - target))
    if lpips_weight:
        loss = loss + lpips_weight * perceptual_distance(pred, target)
    return loss
