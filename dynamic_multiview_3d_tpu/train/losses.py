"""Losses (SURVEY.md R13/R14 -> T4): L1 photometric + mask loss (+ optional

flow smoothness). All terms are computed in f32 on the head outputs."""

from __future__ import annotations

import jax.numpy as jnp

from dynamic_multiview_3d_tpu.config import TrainConfig
from dynamic_multiview_3d_tpu.ops import sampling


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred.astype(jnp.float32)
                            - target.astype(jnp.float32)))


def mask_loss(mask: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """BCE(mask, warp-validity): the soft visibility mask should open where
    the flow lands inside the source image and close where it falls off it
    (the warp path carries no information there). [B,K,H,W,1] / [B,K,H,W,2].
    """
    b, k, h, w, _ = flow.shape
    target = sampling.in_bounds_mask(
        flow.reshape(b * k, h, w, 2), h, w).reshape(b, k, h, w, 1)
    m = jnp.clip(mask.astype(jnp.float32), 1e-6, 1.0 - 1e-6)
    bce = -(target * jnp.log(m) + (1.0 - target) * jnp.log1p(-m))
    return jnp.mean(bce)


def smoothness_loss(flow: jnp.ndarray) -> jnp.ndarray:
    """Total-variation smoothness on the flow field."""
    dx = jnp.abs(flow[..., :, 1:, :] - flow[..., :, :-1, :])
    dy = jnp.abs(flow[..., 1:, :, :] - flow[..., :-1, :, :])
    return jnp.mean(dx) + jnp.mean(dy)


def total_loss(out: dict, batch: dict, cfg: TrainConfig
               ) -> tuple[jnp.ndarray, dict]:
    """Combined objective + per-term metrics.

    out:   model outputs (view/flow/mask...), batch: has 'tgt_images'.
    """
    target = batch["tgt_images"]
    l1 = l1_loss(out["view"], target)
    lm = mask_loss(out["mask"], out["flow"])
    loss = cfg.l1_weight * l1 + cfg.mask_weight * lm
    metrics = {"loss/l1": l1, "loss/mask": lm}
    if cfg.smooth_weight > 0:
        ls = smoothness_loss(out["flow"])
        loss = loss + cfg.smooth_weight * ls
        metrics["loss/smooth"] = ls
    if "depth" in out:
        # supervise the depth head photometrically wherever the reprojection
        # is valid (masked L1 — invalid pixels are ignored, not pulled to 0)
        valid = out["geo_valid"][..., None].astype(jnp.float32)
        resid = jnp.abs(out["geo_view"].astype(jnp.float32)
                        - target.astype(jnp.float32)) * valid
        geo_l1 = jnp.sum(resid) / jnp.maximum(jnp.sum(valid) * 3.0, 1.0)
        loss = loss + cfg.geo_weight * geo_l1
        metrics["loss/geo_l1"] = geo_l1
    metrics["loss/total"] = loss
    return loss, metrics
