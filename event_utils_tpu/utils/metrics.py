"""Image-quality metrics (PSNR / SSIM), pure jax.

New capability (the reference ships no evaluation metrics; its companion
network repos report these externally): used by ``cli.reconstruct
--eval_gt`` to score E2VID output against ground-truth frames — e.g. the
simulator's true intensity images — and available for any training/eval
loop. Jit/vmap-compatible, NHW or HW arrays in [0, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def psnr(pred, target, max_val: float = 1.0) -> Array:
    """Peak signal-to-noise ratio in dB over the trailing (H, W) axes."""
    pred = jnp.asarray(pred, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    mse = jnp.mean((pred - target) ** 2, axis=(-2, -1))
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_window(size: int, sigma: float):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return g / g.sum()


def ssim(pred, target, max_val: float = 1.0, window: int = 11,
         sigma: float = 1.5, k1: float = 0.01, k2: float = 0.03) -> Array:
    """Structural similarity (Wang et al. 2004): 11x11 Gaussian window,
    standard constants; mean over the image, batched over leading axes."""
    pred = jnp.asarray(pred, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    squeeze = pred.ndim == 2
    if squeeze:
        pred, target = pred[None], target[None]
    lead = pred.shape[:-2]
    pred = pred.reshape((-1, 1) + pred.shape[-2:])    # NCHW, C=1
    target = target.reshape((-1, 1) + target.shape[-2:])

    g = _gaussian_window(window, sigma)
    kern = jnp.outer(g, g)[None, None]               # (1, 1, w, w)

    def f(img):
        return jax.lax.conv_general_dilated(img, kern, (1, 1), "VALID")

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    mu_p, mu_t = f(pred), f(target)
    mu_p2, mu_t2, mu_pt = mu_p ** 2, mu_t ** 2, mu_p * mu_t
    var_p = f(pred ** 2) - mu_p2
    var_t = f(target ** 2) - mu_t2
    cov = f(pred * target) - mu_pt
    s = ((2 * mu_pt + c1) * (2 * cov + c2)
         / ((mu_p2 + mu_t2 + c1) * (var_p + var_t + c2)))
    out = s.mean(axis=(-3, -2, -1)).reshape(lead)
    return out[0] if squeeze else out


def average_endpoint_error(pred_flow, gt_flow) -> Array:
    """AEE: mean L2 distance between flow vectors, the standard optic-flow
    accuracy metric. Inputs ``(..., 2, H, W)``; mean over pixels (and any
    leading axes)."""
    pred_flow = jnp.asarray(pred_flow, jnp.float32)
    gt_flow = jnp.asarray(gt_flow, jnp.float32)
    d = pred_flow - gt_flow
    return jnp.mean(jnp.sqrt(d[..., 0, :, :] ** 2 + d[..., 1, :, :] ** 2))
