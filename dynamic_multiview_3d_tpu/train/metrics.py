"""Quality metrics + observability (SURVEY.md R18 -> T4).

PSNR/SSIM are the parity metrics (BASELINE.json:2). SSIM is implemented here
(dm-pix absent on this machine, SURVEY.md §2d) with the standard Gaussian
11x11 window, matching the classic Wang et al. formulation torch/skimage use.

MetricsWriter: JSONL always (judge-harness friendly), tf.summary/tensorboard
when TF is importable (SURVEY.md §5 observability).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred: jnp.ndarray, target: jnp.ndarray,
         data_range: float = 2.0) -> jnp.ndarray:
    """Peak SNR in dB. Images in [-1,1] -> data_range 2."""
    mse = jnp.mean((pred.astype(jnp.float32)
                    - target.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(pred: jnp.ndarray, target: jnp.ndarray,
         data_range: float = 2.0) -> jnp.ndarray:
    """Mean SSIM over NHWC images (Gaussian 11x11, K1=.01, K2=.03)."""
    if pred.ndim == 5:  # [B,K,H,W,C] -> fold K
        pred = pred.reshape((-1,) + pred.shape[2:])
        target = target.reshape((-1,) + target.shape[2:])
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    kern = _gaussian_kernel()[:, :, None, None]                  # HWIO, 1 ch
    c = pred.shape[-1]
    kern = jnp.tile(kern, (1, 1, 1, c))

    def filt(x):
        # depthwise conv: feature_group_count = channels
        return jax.lax.conv_general_dilated(
            x, kern, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST)

    mu_p, mu_t = filt(pred), filt(target)
    mu_pp, mu_tt, mu_pt = mu_p * mu_p, mu_t * mu_t, mu_p * mu_t
    sig_p = filt(pred * pred) - mu_pp
    sig_t = filt(target * target) - mu_tt
    sig_pt = filt(pred * target) - mu_pt
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    num = (2 * mu_pt + c1) * (2 * sig_pt + c2)
    den = (mu_pp + mu_tt + c1) * (sig_p + sig_t + c2)
    return jnp.mean(num / den)


class MetricsWriter:
    """JSONL metric log (+ tensorboard scalars when available)."""

    def __init__(self, logdir: str, use_tensorboard: bool = True):
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                import tensorflow as tf  # installed; only used for summaries
                self._tb = tf.summary.create_file_writer(logdir)
            except Exception:
                self._tb = None

    def write(self, step: int, metrics: dict) -> None:
        record = {"step": int(step), "time": time.time()}
        record.update({k: float(v) for k, v in metrics.items()})
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(k, float(v), step=int(step))

    @property
    def has_images(self) -> bool:
        return self._tb is not None

    def write_images(self, step: int, tag: str, images: np.ndarray) -> None:
        """images uint8 [N,H,W,3] — pred-vs-target grids (R18)."""
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                tf.summary.image(tag, images, step=int(step),
                                 max_outputs=images.shape[0])

    def close(self):
        self._jsonl.close()
