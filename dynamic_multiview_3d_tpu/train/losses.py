"""Losses (SURVEY.md R13/R14 -> T4): L1 photometric + mask loss (+ optional

flow smoothness). All terms are computed in f32 on the head outputs."""

from __future__ import annotations

import jax.numpy as jnp

from dynamic_multiview_3d_tpu.config import TrainConfig
from dynamic_multiview_3d_tpu.ops import sampling


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred.astype(jnp.float32)
                            - target.astype(jnp.float32)))


def flow_validity(flow: jnp.ndarray) -> jnp.ndarray:
    """Warp-validity target for the mask head: 1 where the flow lands inside
    the source image (the warp path carries no information elsewhere).
    flow [B,K,H,W,2] -> [B,K,H,W,1]."""
    b, k, h, w, _ = flow.shape
    return sampling.in_bounds_mask(
        flow.reshape(b * k, h, w, 2), h, w).reshape(b, k, h, w, 1)


def mask_loss(mask: jnp.ndarray, validity: jnp.ndarray) -> jnp.ndarray:
    """BCE(mask, validity): the soft compositing mask should open where the
    geometric resample is valid and close where it is not. The validity
    target depends on the synthesis mode — flow in-bounds for "flow",
    reprojection validity (geo_valid) for "depth" (see total_loss)."""
    target = validity.astype(jnp.float32)
    m = jnp.clip(mask.astype(jnp.float32), 1e-6, 1.0 - 1e-6)
    bce = -(target * jnp.log(m) + (1.0 - target) * jnp.log1p(-m))
    return jnp.mean(bce)


def smoothness_loss(flow: jnp.ndarray) -> jnp.ndarray:
    """Total-variation smoothness on the flow field."""
    dx = jnp.abs(flow[..., :, 1:, :] - flow[..., :, :-1, :])
    dy = jnp.abs(flow[..., 1:, :, :] - flow[..., :-1, :, :])
    return jnp.mean(dx) + jnp.mean(dy)


def total_loss(out: dict, batch: dict, cfg: TrainConfig,
               synthesis: str = "flow") -> tuple[jnp.ndarray, dict]:
    """Combined objective + per-term metrics.

    out: model outputs (view/flow/mask...), batch: has 'tgt_images'.
    synthesis: which geometric path gates the composite (cfg.model.synthesis)
    — it selects the mask head's validity target.
    """
    target = batch["tgt_images"]
    l1 = l1_loss(out["view"], target)
    if synthesis in ("depth", "multidepth"):
        validity = out["geo_valid"][..., None]
    elif "flow_valid" in out:
        # computed inside the fused warp kernel (or the model's jnp path)
        validity = out["flow_valid"][..., None]
    else:
        validity = flow_validity(out["flow"])
    lm = mask_loss(out["mask"], validity)
    loss = cfg.l1_weight * l1 + cfg.mask_weight * lm
    metrics = {"loss/l1": l1, "loss/mask": lm}
    if cfg.ssim_weight > 0:
        # structural term (DSSIM): the Gaussian-window SSIM in
        # train/metrics.py is plain jnp and differentiates cleanly.
        from dynamic_multiview_3d_tpu.train import metrics as metrics_lib
        ls = 1.0 - metrics_lib.ssim(out["view"], target)
        loss = loss + cfg.ssim_weight * ls
        metrics["loss/dssim"] = ls
    if cfg.smooth_weight > 0 and "flow" in out:
        # multidepth has no flow fields — correspondences come from depth,
        # whose geo_l1 term below is the regularizer that applies there.
        ls = smoothness_loss(out["flow"])
        loss = loss + cfg.smooth_weight * ls
        metrics["loss/smooth"] = ls
    if "depth" in out:
        # supervise the depth head photometrically wherever the reprojection
        # is valid (masked L1 — invalid pixels are ignored, not pulled to 0)
        channels = out["geo_view"].shape[-1]
        valid = out["geo_valid"][..., None].astype(jnp.float32)
        resid = jnp.abs(out["geo_view"].astype(jnp.float32)
                        - target.astype(jnp.float32)) * valid
        geo_l1 = jnp.sum(resid) / jnp.maximum(jnp.sum(valid) * channels, 1.0)
        loss = loss + cfg.geo_weight * geo_l1
        metrics["loss/geo_l1"] = geo_l1
    metrics["loss/total"] = loss
    return loss, metrics
