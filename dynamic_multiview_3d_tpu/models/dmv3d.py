"""DMV3D — pose-conditioned encoder-decoder for dynamic multiview synthesis.

Capability parity with the reference's model layer (SURVEY.md R6-R13, from
BASELINE.json:5): stride-2 conv encoder, pose-conditioned bottleneck, decoder
with U-Net skips, appearance-flow + soft-mask (+ optional depth) heads,
ConvGRU recurrence over video frames. TPU-first design decisions:

- recurrence is a single ``jax.lax.scan`` (via ``nn.scan``): fwd+bwd compile
  into ONE XLA program, constant compile size in T (BASELINE.json:5)
- last-frame skip features ride in the scan *carry* (overwritten each step)
  so no O(T) activation stash is materialized
- K target poses are folded into the batch axis (B*K) for the decoder — one
  big conv batch for the MXU instead of a Python loop over poses
- NHWC, bf16 compute / f32 params; heads + warping run in f32
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from dynamic_multiview_3d_tpu.config import ModelConfig
from dynamic_multiview_3d_tpu.models.layers import (
    ConvBlock,
    ConvGRUCell,
    ConvLSTMCell,
    FastGroupNorm,
    _num_groups,
    depth_to_space2,
)
from dynamic_multiview_3d_tpu.ops import pose as pose_ops
from dynamic_multiview_3d_tpu.ops import reproject as reproject_ops
from dynamic_multiview_3d_tpu.ops import sampling


def _features(cfg: ModelConfig, level: int) -> int:
    return min(cfg.base_features * (2 ** level), cfg.max_features)


# Tests monkeypatch this to run the Pallas synthesis path in interpret mode
# on the CPU backend (parity coverage without a chip).
_PALLAS_INTERPRET = False


def _dtype(cfg: ModelConfig):
    return jnp.dtype(cfg.dtype)


class Encoder(nn.Module):
    """Stride-2 conv stack image -> (bottleneck, per-resolution skips)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        cfg = self.cfg
        dt = _dtype(cfg)
        x = x.astype(dt)
        x = ConvBlock(_features(cfg, 0), stride=1, norm=cfg.norm, dtype=dt,
                      name="stem")(x)
        skips = [x]
        for i in range(1, cfg.num_levels + 1):
            f = _features(cfg, i)
            x = ConvBlock(f, stride=2, norm=cfg.norm, dtype=dt,
                          name=f"down{i}")(x)
            x = ConvBlock(f, stride=1, norm=cfg.norm, dtype=dt,
                          name=f"res{i}")(x)
            if i < cfg.num_levels:
                skips.append(x)
        return x, tuple(skips)


class PoseBottleneck(nn.Module):
    """Inject the target-pose code at the bottleneck (SURVEY.md R7).

    MLP-embed the pose, tile it over the bottleneck's spatial extent, concat,
    and mix with 1x1 + 3x3 convs.

    A 3-D ``pose_code`` [N, T, P] (multi-source, multi_head_mode="shared")
    embeds every per-source code through the SAME MLP and mean-pools over
    the source axis — a permutation-invariant set encoding whose parameter
    shapes are independent of T (T-agnostic checkpoints; the per-source
    discrimination happens at the decoder's shared per-source head instead).
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, bottleneck: jnp.ndarray, pose_code: jnp.ndarray):
        cfg = self.cfg
        dt = _dtype(cfg)
        emb = nn.Dense(cfg.pose_embed_dim, dtype=dt, name="pose_fc1")(
            pose_code.astype(dt))
        emb = nn.relu(emb)
        emb = nn.Dense(cfg.pose_embed_dim, dtype=dt, name="pose_fc2")(emb)
        if emb.ndim == 3:                       # [N, T, E] -> pooled [N, E]
            emb = jnp.mean(emb, axis=1)
        n, h, w, _ = bottleneck.shape
        tiled = jnp.broadcast_to(emb[:, None, None, :],
                                 (n, h, w, cfg.pose_embed_dim))
        x = jnp.concatenate([bottleneck.astype(dt), tiled], axis=-1)
        x = ConvBlock(cfg.gru_features, kernel=1, norm=cfg.norm, dtype=dt,
                      name="mix1")(x)
        x = ConvBlock(cfg.gru_features, kernel=3, norm=cfg.norm, dtype=dt,
                      name="mix2")(x)
        return x


class Decoder(nn.Module):
    """Upsample-conv stack with U-Net skips -> flow/mask/rgb(/depth) heads.

    TPU-first restructuring (round-2 profile pass — the decoder was 5.7 ms
    of the 11.1 ms c2 forward at 52% MFU, plus ~3 ms of skip-duplication
    HBM traffic):

    - subpixel upsampling: a ``cfg.up_kernel``² conv at the LOW resolution
      emits the 4 high-res phases as 4f channels + depth-to-space, instead
      of nearest-2x upsample + 3x3 conv. At the default 2x2 kernel this is
      2.25x fewer MXU FLOPs for the same 2x2-source-pixel support per
      output, never materializes an upsampled intermediate, and the fatter
      4f channel dim tiles better on the MXU.
    - split skip fusion: concat([x, skip]) -> conv ==
      conv_x(x) + conv_s(skip). conv_s runs ONCE per example [B] and its
      result broadcasts over the K target poses, so the skip pyramid is
      neither duplicated K-fold in HBM (round-1 tile_k) nor convolved K
      times.
    - heads: flow/mask/rgb come from ONE f32 conv over the full-res
      features (single pass), then split; the optional depth head stays
      separate (config-dependent).

    ``x`` is per-target [B*K, ...]; ``skips`` are per-example [B, ...];
    ``k`` is the number of targets folded into x's batch axis.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, skips: Sequence[jnp.ndarray],
                 k: int = 1, num_sources: int = 1,
                 src_codes: jnp.ndarray | None = None):
        cfg = self.cfg
        dt = _dtype(cfg)
        x = x.astype(dt)
        ku = cfg.up_kernel
        for i in range(cfg.num_levels - 1, -1, -1):
            f = _features(cfg, i)
            x = nn.Conv(4 * f, (ku, ku), padding="SAME", dtype=dt,
                        name=f"up{i}_conv")(x)
            if cfg.up_order == "norm_first":
                # normalize/activate the 4 phases at LOW res (per-phase
                # channel groups), then shuffle — the transpose feeds the
                # fuse conv directly instead of standing alone in HBM.
                if cfg.norm == "group":
                    x = FastGroupNorm(num_groups=4 * _num_groups(f),
                                      dtype=dt, name=f"up{i}_norm")(x)
                x = depth_to_space2(nn.relu(x))
            else:
                x = depth_to_space2(x)
                if cfg.norm == "group":
                    x = FastGroupNorm(num_groups=_num_groups(f), dtype=dt,
                                      name=f"up{i}_norm")(x)
                x = nn.relu(x)
            b = skips[i].shape[0]
            hh, ww = x.shape[1:3]
            if cfg.skip_fusion == "concat":
                # one conv over [x, skip] — algebraically the split form
                # with the add folded into the conv's output write. The
                # skip broadcast over K costs HBM reads; the materialized
                # hx + add round-trip goes away. A/B on hardware.
                sk = jnp.broadcast_to(
                    skips[i].astype(dt)[:, None],
                    (b, k, hh, ww, skips[i].shape[-1])
                ).reshape(b * k, hh, ww, -1)
                x = nn.Conv(f, (3, 3), padding="SAME", dtype=dt,
                            name=f"fuse{i}_x")(
                    jnp.concatenate([x, sk], axis=-1))
            else:
                hx = nn.Conv(f, (3, 3), padding="SAME", dtype=dt,
                             name=f"fuse{i}_x")(x)
                hs = nn.Conv(f, (3, 3), padding="SAME", dtype=dt,
                             use_bias=False,
                             name=f"fuse{i}_skip")(skips[i].astype(dt))
                # NOTE(round-2 negative result): a Pallas-fused add+GN+relu
                # epilogue was built and measured SLOWER than this XLA
                # composition (1.48 vs 1.00 ms at the level-0 shape) — XLA
                # already fuses the add into the norm's reduce/normalize
                # passes well. Trace evidence in BASELINE.md.
                x = (hx.reshape(b, k, hh, ww, f)
                     + hs[:, None]).reshape(b * k, hh, ww, f)
            if cfg.norm == "group":
                x = FastGroupNorm(num_groups=_num_groups(f), dtype=dt,
                                  name=f"fuse{i}_norm")(x)
            x = nn.relu(x)

        # Heads: ONE conv over the full-res features, nonlinearities in f32
        # on the small 6-ch output. heads_dtype=bfloat16 (default) keeps the
        # wide input in bf16 — the f32 materialization of the full-res
        # feature map was an HBM-roofline op in the round-2 trace; MXU
        # accumulation is f32 either way, so only head-weight rounding
        # (~0.4% relative) differs from the float32 setting.
        dth = jnp.dtype(cfg.heads_compute_dtype)
        xf = x.astype(dth)
        if src_codes is not None and cfg.synthesis in ("multiflow",
                                                       "multidepth"):
            return self._shared_multi_heads(xf, src_codes, num_sources, dth)
        if cfg.synthesis == "multiflow":
            # Per-source heads (SURVEY.md R9 extended to true multiview):
            # one conv emits S flow fields + S confidence logits alongside
            # mask/rgb — every source frame gets its own warp, and the
            # confidences drive the softmax blend in the model's composite.
            s = num_sources
            hm = nn.Conv(3 * s + 4, (3, 3), padding="SAME", dtype=dth,
                         name="heads_multi")(xf).astype(jnp.float32)
            n, hh2, ww2 = hm.shape[:3]
            flow = (jnp.tanh(hm[..., :2 * s]).reshape(n, hh2, ww2, s, 2)
                    * (cfg.max_flow * cfg.image_size))
            out = {"flow": flow,                       # [N, H, W, S, 2]
                   "conf": hm[..., 2 * s:3 * s],       # [N, H, W, S] logits
                   "mask": nn.sigmoid(hm[..., 3 * s:3 * s + 1]),
                   "rgb": jnp.tanh(hm[..., 3 * s + 1:3 * s + 4])}
            if cfg.predict_depth:
                raw = nn.Conv(1, (3, 3), padding="SAME", dtype=dth,
                              name="depth_head")(xf).astype(jnp.float32)
                out["depth"] = nn.softplus(raw)[..., 0] + 0.1
            return out
        if cfg.synthesis == "multidepth":
            # Geometric twin of the multiflow heads (VERDICT r3 missing #4):
            # ONE target-view depth map (geometry is target-centric — the
            # same surface reprojects into every source) plus a confidence
            # logit PER SOURCE for the appearance blend. No flow fields:
            # correspondences come from depth + relative camera transforms.
            s = num_sources
            hm = nn.Conv(s + 4, (3, 3), padding="SAME", dtype=dth,
                         name="heads_multi")(xf).astype(jnp.float32)
            out = {"conf": hm[..., :s],                # [N, H, W, S] logits
                   "mask": nn.sigmoid(hm[..., s:s + 1]),
                   "rgb": jnp.tanh(hm[..., s + 1:s + 4])}
            raw = nn.Conv(1, (3, 3), padding="SAME", dtype=dth,
                          name="depth_head")(xf).astype(jnp.float32)
            out["depth"] = nn.softplus(raw)[..., 0] + 0.1
            return out
        h3 = nn.Conv(6, (3, 3), padding="SAME", dtype=dth,
                     name="heads")(xf).astype(jnp.float32)
        flow = jnp.tanh(h3[..., 0:2]) * (cfg.max_flow * cfg.image_size)
        mask = nn.sigmoid(h3[..., 2:3])
        rgb = jnp.tanh(h3[..., 3:6])
        out = {"flow": flow, "mask": mask, "rgb": rgb}
        if cfg.predict_depth:
            raw = nn.Conv(1, (3, 3), padding="SAME", dtype=dth,
                          name="depth_head")(xf).astype(jnp.float32)
            out["depth"] = nn.softplus(raw)[..., 0] + 0.1
        return out

    def _shared_multi_heads(self, xf: jnp.ndarray, src_codes: jnp.ndarray,
                            num_sources: int, dth) -> dict:
        """T-agnostic multi-source heads (multi_head_mode="shared").

        One per-source head applied over the source axis with SHARED
        weights: a spatial trunk conv runs once per target, each source's
        pose code enters as a FiLM-style additive bias, and two 1x1 convs
        (T folded into the batch axis) emit that source's outputs. Param
        shapes carry no T — one checkpoint serves ANY source count, which
        the baked 3T+4 / T+4 conv cannot (VERDICT r4 missing #4 /
        BASELINE.json:5's generic predict contract).

        TPU cost note: the per-source tensors are [N*T, H, W, F] with
        F = cfg.src_head_features (32): at the c3mf shape that is ~134 MB
        of HBM per 1x1 conv pass — ~0.2 ms at the 819 GB/s roofline — vs
        the baked head's single conv; measured on chip in BASELINE.md.
        """
        cfg = self.cfg
        s = num_sources
        # shared (source-independent) heads: compositing mask + hallucinated
        # rgb — same outputs as the baked layout's trailing 4 channels.
        base = nn.Conv(4, (3, 3), padding="SAME", dtype=dth,
                       name="heads_base")(xf).astype(jnp.float32)
        out = {"mask": nn.sigmoid(base[..., 0:1]),
               "rgb": jnp.tanh(base[..., 1:4])}
        f = cfg.src_head_features
        hf = nn.Conv(f, (3, 3), padding="SAME", dtype=dth,
                     name="srchead_trunk")(xf)               # [N, H, W, F]
        emb = nn.Dense(f, dtype=dth,
                       name="srchead_emb")(src_codes.astype(dth))
        emb = nn.Dense(f, dtype=dth, name="srchead_pose")(nn.relu(emb))
        n, hh, ww = hf.shape[:3]
        u = nn.relu(hf[:, None] + emb[:, :, None, None, :])  # [N, S, H, W, F]
        u = u.reshape(n * s, hh, ww, f)
        u = nn.relu(nn.Conv(f, (1, 1), dtype=dth, name="srchead_mix")(u))
        out_ch = 3 if cfg.synthesis == "multiflow" else 1
        y = nn.Conv(out_ch, (1, 1), dtype=dth,
                    name="srchead_out")(u).astype(jnp.float32)
        y = y.reshape(n, s, hh, ww, out_ch)
        if cfg.synthesis == "multiflow":
            out["flow"] = (jnp.tanh(y[..., :2]).transpose(0, 2, 3, 1, 4)
                           * (cfg.max_flow * cfg.image_size))  # [N,H,W,S,2]
            out["conf"] = y[..., 2].transpose(0, 2, 3, 1)      # [N,H,W,S]
        else:
            out["conf"] = y[..., 0].transpose(0, 2, 3, 1)
            raw = nn.Conv(1, (3, 3), padding="SAME", dtype=dth,
                          name="depth_head")(xf).astype(jnp.float32)
            out["depth"] = nn.softplus(raw)[..., 0] + 0.1
        return out


class _RecurrentStep(nn.Module):
    """One scan step: encode frame, advance ConvGRU state, refresh skips."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, carry, frame):
        h, _ = carry
        bottleneck, skips = Encoder(self.cfg, name="encoder")(frame)
        dt = _dtype(self.cfg)
        if self.cfg.rnn == "lstm":
            h = ConvLSTMCell(self.cfg.gru_features, dtype=dt,
                             name="lstm")(h.astype(dt), bottleneck)
        else:
            h = ConvGRUCell(self.cfg.gru_features, dtype=dt,
                            name="gru")(h.astype(dt), bottleneck)
        return (h, skips), None


class DMV3D(nn.Module):
    """Full model: ``(image_seq, src_poses, tgt_poses) -> novel views``.

    image_seq [B,T,H,W,3] in [-1,1]; src_poses [B,T,3]; tgt_poses [B,K,3]
    (az, el, radius). Returns dict with "view" [B,K,H,W,3] plus aux heads.
    """

    cfg: ModelConfig

    def skip_shapes(self, batch: int) -> list[tuple[int, ...]]:
        cfg = self.cfg
        return [
            (batch, cfg.image_size // (2 ** i), cfg.image_size // (2 ** i),
             _features(cfg, i))
            for i in range(cfg.num_levels)
        ]

    @nn.compact
    def __call__(self, image_seq: jnp.ndarray, src_poses: jnp.ndarray,
                 tgt_poses: jnp.ndarray):
        cfg = self.cfg
        b, t, h, w, _ = image_seq.shape
        k = tgt_poses.shape[1]
        dt = _dtype(cfg)

        # --- temporal encode: lax.scan over frames, state + skips in carry.
        cell = ConvLSTMCell if cfg.rnn == "lstm" else ConvGRUCell
        h0 = cell.init_state(b, cfg.bottleneck_size,
                             cfg.bottleneck_size, cfg.gru_features, dt)
        skips0 = tuple(jnp.zeros(s, dt) for s in self.skip_shapes(b))
        # remat on the scan body trades recompute for O(1)-in-T activation
        # memory (SURVEY.md §5 long-context story).
        step_cls = nn.remat(_RecurrentStep) if cfg.remat_scan else _RecurrentStep
        step = nn.scan(
            step_cls,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1, out_axes=1,
        )(cfg, name="recurrent")
        (state, skips), _ = step((h0, skips0), image_seq)
        if cfg.rnn == "lstm":
            state = ConvLSTMCell.hidden(state, cfg.gru_features)

        # --- pose conditioning: relative code from source view(s) to each
        # target; fold K into batch for one big decoder pass. Multiflow
        # conditions on EVERY source pose (the decoder predicts a warp per
        # source, so it needs to know where each one sits relative to the
        # target); the single-warp paths keep the last-source code.
        src_last = src_poses[:, -1]                                # [B, 3]
        src_codes = None
        if cfg.synthesis in ("multiflow", "multidepth"):
            src_rep = jnp.repeat(src_poses, k, axis=0)             # [B*K,T,3]
            tgt_rep = jnp.broadcast_to(
                tgt_poses.reshape(b * k, 1, -1), src_rep.shape)
            codes = pose_ops.encode_pose(
                src_rep, tgt_rep, mode=cfg.pose_mode)              # [B*K,T,P]
            if cfg.multi_head_mode == "shared":
                # T-agnostic layout: the bottleneck pools the per-source
                # codes; the decoder's shared per-source head gets them raw.
                pose_code = codes
                src_codes = codes
            elif cfg.multi_head_mode == "baked":
                pose_code = codes.reshape(b * k, -1)               # [B*K,T*P]
            else:
                raise ValueError(
                    f"unknown multi_head_mode: {cfg.multi_head_mode!r}")
        else:
            pose_code = pose_ops.encode_pose(
                jnp.repeat(src_last, k, axis=0),
                tgt_poses.reshape(b * k, -1),
                mode=cfg.pose_mode,
            )                                                      # [B*K, P]

        def tile_k(x):
            return jnp.repeat(x, k, axis=0)

        # Only the (small, bottleneck-res) recurrent state is tiled over K;
        # the skip pyramid stays per-example [B] — the decoder broadcasts
        # its skip-branch convs over the K targets internally.
        state_k = tile_k(state)
        z = PoseBottleneck(cfg, name="bottleneck")(state_k, pose_code)
        heads = Decoder(cfg, name="decoder")(z, skips, k, num_sources=t,
                                             src_codes=src_codes)

        impl = "pallas" if (cfg.use_pallas
                            and jax.default_backend() == "tpu") else "jnp"
        mask = heads["mask"]

        if cfg.synthesis == "multiflow":
            return self._multiflow_composite(heads, image_seq, impl)
        if cfg.synthesis == "multidepth":
            return self._multidepth_composite(heads, image_seq, src_poses,
                                              tgt_poses, impl)

        # --- synthesis: appearance-flow warp of the last frame + compositing.
        # On TPU with flow synthesis the warp, the composite AND the
        # mask-loss validity target run as ONE fused Pallas kernel
        # (flow_warp_composite) — heads -> warp -> composite never
        # round-trips HBM. Other paths compose the same math in XLA.
        last_frame = tile_k(image_seq[:, -1].astype(jnp.float32))
        view = None
        if impl == "pallas" and cfg.synthesis == "flow":
            from dynamic_multiview_3d_tpu.kernels import grid_sample_pallas
            view, warped, flow_valid = grid_sample_pallas.flow_warp_composite(
                last_frame, heads["flow"], mask, heads["rgb"],
                padding_mode="border", precision=cfg.warp_precision)
        else:
            warped = sampling.flow_warp(last_frame, heads["flow"],
                                        padding_mode="border", impl=impl,
                                        precision=cfg.warp_precision)
            flow_valid = sampling.in_bounds_mask(
                heads["flow"].astype(jnp.float32), h, w)

        out = {
            "warped": warped.reshape(b, k, h, w, 3),
            "flow": heads["flow"].reshape(b, k, h, w, 2),
            "flow_valid": flow_valid.reshape(b, k, h, w),
            "mask": mask.reshape(b, k, h, w, 1),
            "rgb": heads["rgb"].reshape(b, k, h, w, 3),
        }

        if cfg.predict_depth:
            # Geometric path (SURVEY.md R11): predicted target-view depth +
            # relative camera transform reproject the last source frame.
            depth = heads["depth"]                                 # [B*K,H,W]
            focal = jnp.full((b * k,), float(max(h, w)), jnp.float32)
            intr = pose_ops.intrinsics_matrix(
                focal, (w - 1) / 2.0, (h - 1) / 2.0)
            t_src = pose_ops.look_at_extrinsics(jnp.repeat(src_last, k, 0))
            t_tgt = pose_ops.look_at_extrinsics(tgt_poses.reshape(b * k, -1))
            rel = pose_ops.relative_transform(t_src, t_tgt)
            geo_view = None
            if impl == "pallas":
                # fused kernels: correspondence field computed in-kernel;
                # in depth-synthesis mode the composite fuses in too
                # (depth twin of flow_warp_composite — VERDICT r2 #3).
                from dynamic_multiview_3d_tpu.kernels import reproject_pallas
                if cfg.synthesis == "depth":
                    view, geo_view, geo_valid = \
                        reproject_pallas.depth_reproject_composite(
                            last_frame, depth, intr, rel, mask,
                            heads["rgb"], precision=cfg.warp_precision)
                else:
                    geo_view, geo_valid = \
                        reproject_pallas.depth_reproject_sample(
                            last_frame, depth, intr, rel,
                            precision=cfg.warp_precision)
            else:
                geo_view, geo_valid = reproject_ops.depth_reproject_sample(
                    last_frame, depth, intr, rel, impl=impl,
                    precision=cfg.warp_precision)
            out["depth"] = depth.reshape(b, k, h, w)
            out["geo_view"] = geo_view.reshape(b, k, h, w, 3)
            out["geo_valid"] = geo_valid.reshape(b, k, h, w)

        # Composite: mask gates the geometric resample (flow warp or depth
        # reprojection) against the hallucinated rgb (SURVEY.md R9/R13).
        # Both pallas synthesis paths already composited inside their fused
        # kernels.
        if cfg.synthesis == "depth":
            if not cfg.predict_depth:
                raise ValueError("synthesis='depth' requires predict_depth=True")
            if view is None:
                view = mask * geo_view + (1.0 - mask) * heads["rgb"]
        elif view is None:
            view = mask * warped + (1.0 - mask) * heads["rgb"]
        out["view"] = view.reshape(b, k, h, w, 3)
        return out

    def _multiflow_composite(self, heads: dict, image_seq: jnp.ndarray,
                             impl: str) -> dict:
        """True-multiview synthesis (cfg.synthesis='multiflow'): warp EVERY
        source frame into the target view with its own predicted flow, blend
        by learned per-source confidence (softmax over sources, out-of-bounds
        sources excluded), and mask-gate against the hallucinated rgb.

        Single-warp synthesis can only resample the last frame — appearance
        revealed in earlier frames reaches the output via the bottleneck GRU
        state alone, which caps quality (~19.9 dB static at 128²,
        BASELINE.md). Here the whole sequence contributes *appearance*, which
        is the point of a "dynamic multiview" model (SURVEY.md R9+R12).

        TPU layout: the warp batches as N = B*T source images, each sampled
        at its K*H*W target pixels — the K target axis rides the sampler's
        pixel/lane axis, so source frames are never duplicated across
        targets in HBM. The softmax blend is an elementwise chain XLA fuses.
        """
        cfg = self.cfg
        if cfg.predict_depth:
            raise ValueError("synthesis='multiflow' does not combine with "
                             "predict_depth (use synthesis='depth' for the "
                             "reprojection path)")
        b, t, h, w, _ = image_seq.shape
        flow = heads["flow"]                              # [B*K, H, W, T, 2]
        conf = heads["conf"]                              # [B*K, H, W, T]
        k = flow.shape[0] // b
        src = image_seq.astype(jnp.float32).reshape(b * t, h, w, 3)

        # continuous source-pixel coords per (b, t, k, pixel)
        f_btk = flow.reshape(b, k, h, w, t, 2).transpose(0, 4, 1, 2, 3, 5)
        coords = sampling.base_grid(h, w, jnp.float32)[None, None, None] \
            + f_btk                                       # [B, T, K, H, W, 2]
        valid = ((coords[..., 0] >= 0) & (coords[..., 0] <= w - 1)
                 & (coords[..., 1] >= 0) & (coords[..., 1] <= h - 1)
                 ).astype(jnp.float32)                    # [B, T, K, H, W]

        mask = heads["mask"].reshape(b, k, h, w, 1)
        rgb = heads["rgb"].reshape(b, k, h, w, 3)

        if impl == "pallas":
            from dynamic_multiview_3d_tpu.kernels import multiflow_pallas
            if multiflow_pallas.kernel_supported(
                    t, 3, k * h * w, h, w, cfg.warp_precision):
                # Fully fused path: per-source sampling, the validity-biased
                # softmax blend AND the mask composite run in ONE kernel —
                # no [B,K,H,W,T,3] warped intermediate ever reaches HBM
                # (VERDICT r3 #3). Layout: P = (K,H,W) rides the lane axis.
                imgs = src.reshape(b, t, h, w, 3).transpose(0, 1, 4, 2, 3)
                cc = coords.reshape(b, t, k * h * w, 2)
                conf_tp = conf.reshape(b, k, h, w, t) \
                    .transpose(0, 4, 1, 2, 3).reshape(b, t, k * h * w)
                rgb_cp = rgb.transpose(0, 4, 1, 2, 3).reshape(b, 3, k * h * w)
                view, multi, any_valid, wts = \
                    multiflow_pallas.multiflow_composite_pix(
                        imgs, cc[..., 0], cc[..., 1], conf_tp,
                        mask.reshape(b, k * h * w), rgb_cp,
                        "border", _PALLAS_INTERPRET, cfg.warp_precision)
                def back(x):                         # [B,3,KHW] -> [B,K,H,W,3]
                    return (x.reshape(b, 3, k, h, w)
                            .transpose(0, 2, 3, 4, 1))
                return {
                    "view": back(view),
                    "warped": back(multi),
                    "mask": mask,
                    "rgb": rgb,
                    "flow": flow.reshape(b, k, h, w, t, 2)
                                .transpose(0, 1, 4, 2, 3, 5),
                    "flow_valid": any_valid.reshape(b, k, h, w),
                    "conf_weights": wts.reshape(b, t, k, h, w)
                                       .transpose(0, 2, 3, 4, 1),
                }
            from dynamic_multiview_3d_tpu.kernels import grid_sample_pallas
            if not grid_sample_pallas.kernel_supported(
                    3, k * h * w, h, w, cfg.warp_precision):
                impl = "jnp"
        if impl == "pallas":
            from dynamic_multiview_3d_tpu.kernels import grid_sample_pallas
            cc = coords.reshape(b * t, k * h * w, 2)
            warped = grid_sample_pallas.sample_pixel_coords(
                jnp.transpose(src, (0, 3, 1, 2)), cc[..., 0], cc[..., 1],
                "border", _PALLAS_INTERPRET, cfg.warp_precision)  # [B*T,3,KHW]
            warped = warped.reshape(b, t, 3, k, h, w) \
                .transpose(0, 3, 4, 5, 1, 2)              # [B, K, H, W, T, 3]
        else:
            grid = sampling.normalize_coords(
                coords.reshape(b * t, k * h, w, 2), h, w, align_corners=True)
            warped = sampling.grid_sample(
                src, grid, align_corners=True, padding_mode="border")
            warped = warped.reshape(b, t, k, h, w, 3) \
                .transpose(0, 2, 3, 4, 1, 5)              # [B, K, H, W, T, 3]

        valid = valid.transpose(0, 2, 3, 4, 1)            # [B, K, H, W, T]
        conf = conf.reshape(b, k, h, w, t)
        # exclude out-of-bounds sources from the blend: a -30 logit bias is
        # an effective -inf; if ALL sources are invalid the blend degrades
        # to uniform and the (validity-supervised) mask closes there anyway.
        wts = jax.nn.softmax(conf + (valid - 1.0) * 30.0, axis=-1)
        multi = jnp.sum(wts[..., None] * warped, axis=-2) # [B, K, H, W, 3]
        any_valid = jnp.max(valid, axis=-1)               # [B, K, H, W]
        view = mask * multi + (1.0 - mask) * rgb
        return {
            "view": view,
            "warped": multi,
            "mask": mask,
            "rgb": rgb,
            "flow": flow.reshape(b, k, h, w, t, 2)
                        .transpose(0, 1, 4, 2, 3, 5),     # [B, K, T, H, W, 2]
            "flow_valid": any_valid,
            "conf_weights": wts,                          # [B, K, H, W, T]
        }

    def _multidepth_composite(self, heads: dict, image_seq: jnp.ndarray,
                              src_poses: jnp.ndarray, tgt_poses: jnp.ndarray,
                              impl: str) -> dict:
        """Multiview GEOMETRIC synthesis (cfg.synthesis='multidepth') — the
        depth twin of multiflow (VERDICT r3 missing #4). The decoder predicts
        ONE depth map per target view (the scene surface is target-centric);
        each source frame is resampled at the correspondences that depth
        induces under the source's own relative camera transform, and the
        samples are blended by learned per-source confidence, exactly like
        multiflow. Where multiflow lets the network pick correspondences
        freely, multidepth constrains them to a single consistent geometry —
        T views of one surface instead of T independent warps.

        TPU layout: the per-source correspondence math (9 FMAs + a divide
        per pixel per source, `ops/reproject.py:reproject_coords` batched
        over B*K*T) is cheap elementwise XLA; the expensive part — per-source
        sampling + softmax blend + composite — reuses the SAME fused Pallas
        kernel as multiflow (`multiflow_composite_pix` takes pixel coords,
        it does not care whether a flow head or reprojection produced them),
        so the [B,K,H,W,T,3] warped intermediate again never reaches HBM.
        Behind-camera reprojections (z <= eps) are excluded from the blend
        by a -30 logit bias folded into the confidence before the kernel;
        the kernel adds the same bias for out-of-bounds coords.
        """
        cfg = self.cfg
        if cfg.predict_depth:
            raise ValueError("synthesis='multidepth' already predicts depth; "
                             "predict_depth=True is only for adding the "
                             "geometric side-path to 'flow' synthesis")
        b, t, h, w, _ = image_seq.shape
        k = tgt_poses.shape[1]
        depth = heads["depth"]                             # [B*K, H, W]
        conf = heads["conf"]                               # [B*K, H, W, T]
        mask = heads["mask"].reshape(b, k, h, w, 1)
        rgb = heads["rgb"].reshape(b, k, h, w, 3)
        src = image_seq.astype(jnp.float32).reshape(b * t, h, w, 3)

        # rel[b,k,t] = transform taking target-camera (b,k) coords into
        # source-camera (b,t) coords; flattened N = (B,K,T) row-major.
        t_tgt = pose_ops.look_at_extrinsics(
            tgt_poses.reshape(b * k, -1)).reshape(b, k, 1, 4, 4)
        t_src = pose_ops.look_at_extrinsics(
            src_poses.reshape(b * t, -1)).reshape(b, 1, t, 4, 4)
        rel = pose_ops.relative_transform(
            jnp.broadcast_to(t_src, (b, k, t, 4, 4)),
            jnp.broadcast_to(t_tgt, (b, k, t, 4, 4))).reshape(-1, 4, 4)
        focal = jnp.full((b * k * t,), float(max(h, w)), jnp.float32)
        intr = pose_ops.intrinsics_matrix(focal, (w - 1) / 2.0, (h - 1) / 2.0)
        depth_rep = jnp.repeat(depth.astype(jnp.float32), t, axis=0)
        coords, z_ok = reproject_ops.reproject_coords(depth_rep, intr, rel)
        coords = coords.reshape(b, k, t, h, w, 2)
        z_ok = z_ok.reshape(b, k, t, h, w)
        inb = ((coords[..., 0] >= 0) & (coords[..., 0] <= w - 1)
               & (coords[..., 1] >= 0) & (coords[..., 1] <= h - 1)
               ).astype(jnp.float32)                       # [B, K, T, H, W]
        # geometric validity = in-front AND in-bounds; any-source validity is
        # the mask head's supervision target (losses.total_loss).
        any_valid = jnp.max(z_ok * inb, axis=2)            # [B, K, H, W]
        conf_bk = conf.reshape(b, k, h, w, t)
        # fold the z-validity into the logits; the sampler's own bias
        # handles out-of-bounds.
        conf_z = conf_bk + (z_ok.transpose(0, 1, 3, 4, 2) - 1.0) * 30.0

        out = {"mask": mask, "rgb": rgb,
               "depth": depth.reshape(b, k, h, w),
               "geo_valid": any_valid}

        if impl == "pallas":
            from dynamic_multiview_3d_tpu.kernels import multiflow_pallas
            if not multiflow_pallas.kernel_supported(
                    t, 3, k * h * w, h, w, cfg.warp_precision):
                impl = "jnp"
        if impl == "pallas":
            imgs = src.reshape(b, t, h, w, 3).transpose(0, 1, 4, 2, 3)
            cc = (coords.transpose(0, 2, 1, 3, 4, 5)      # [B,T,K,H,W,2]
                  .reshape(b, t, k * h * w, 2))
            conf_tp = conf_z.transpose(0, 4, 1, 2, 3).reshape(b, t, k * h * w)
            rgb_cp = rgb.transpose(0, 4, 1, 2, 3).reshape(b, 3, k * h * w)
            view, multi, _, wts = multiflow_pallas.multiflow_composite_pix(
                imgs, cc[..., 0], cc[..., 1], conf_tp,
                mask.reshape(b, k * h * w), rgb_cp,
                "border", _PALLAS_INTERPRET, cfg.warp_precision)
            def back(x):                             # [B,3,KHW] -> [B,K,H,W,3]
                return x.reshape(b, 3, k, h, w).transpose(0, 2, 3, 4, 1)
            out.update(
                view=back(view), warped=back(multi), geo_view=back(multi),
                conf_weights=wts.reshape(b, t, k, h, w)
                               .transpose(0, 2, 3, 4, 1))
            return out

        grid = sampling.normalize_coords(
            coords.transpose(0, 2, 1, 3, 4, 5).reshape(b * t, k * h, w, 2),
            h, w, align_corners=True)
        warped = sampling.grid_sample(
            src, grid, align_corners=True, padding_mode="border")
        warped = warped.reshape(b, t, k, h, w, 3) \
            .transpose(0, 2, 3, 4, 1, 5)                  # [B, K, H, W, T, 3]
        inb_bk = inb.transpose(0, 1, 3, 4, 2)             # [B, K, H, W, T]
        wts = jax.nn.softmax(conf_z + (inb_bk - 1.0) * 30.0, axis=-1)
        multi = jnp.sum(wts[..., None] * warped, axis=-2)  # [B, K, H, W, 3]
        view = mask * multi + (1.0 - mask) * rgb
        out.update(view=view, warped=multi, geo_view=multi, conf_weights=wts)
        return out
