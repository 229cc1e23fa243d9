"""Frame-folder video dataset (SURVEY.md R1 -> T1, config 5).

On-disk layout (ffmpeg is absent on this machine — SURVEY.md §7 hard-part
#3 — so video ships as frame folders, decoded with imageio in Grain
workers):

    root/
      scene_00000/
        meta.json          # {"num_views": V, "seq_len": T_avail, "dynamic": bool}
        poses.npy          # [V, 3] float32 (az, el, radius) per camera
        v000_t000.png      # frame for view v at time t
        ...

Two frame encodings per scene:
- PNG files (the reference-parity "video decode" path: real image decode
  work in Grain workers), or
- ``frames.npy`` — one uint8 [V, T, H, W, 3] array, memory-mapped at read
  time (the production fast path: decode-free, page-cache backed; a single
  host core feeds an order of magnitude more pixels/s than PNG decode).
  ``export_synthetic(fmt="packed")`` writes it; readers auto-detect.

``example(index)`` samples a source camera trajectory + K target views at
the final timestep — the same contract as SyntheticScenes, so the train
loop / Grain pipeline are source-agnostic. ``export_synthetic`` materializes
a synthetic dataset into this layout (gives config-5 streamed-decode runs
real files to decode without external data).
"""

from __future__ import annotations

import json
import os

import numpy as np

from dynamic_multiview_3d_tpu.config import DataConfig
from dynamic_multiview_3d_tpu.data import native
from dynamic_multiview_3d_tpu.data.synthetic import SyntheticScenes, to_uint8


class FrameFolderScenes:
    """Random-access examples over a frame-folder dataset."""

    def __init__(self, cfg: DataConfig):
        if not cfg.root or not os.path.isdir(cfg.root):
            raise FileNotFoundError(
                f"frames dataset root not found: {cfg.root!r} "
                "(generate one with data.frames.export_synthetic)")
        self.cfg = cfg
        self.scenes = sorted(
            d for d in os.listdir(cfg.root)
            if d.startswith("scene_")
            and os.path.isdir(os.path.join(cfg.root, d)))
        if not self.scenes:
            raise FileNotFoundError(f"no scene_* dirs under {cfg.root}")
        self._meta_cache: dict[str, dict] = {}
        self._pack_cache: dict[str, np.ndarray] = {}

    def _meta(self, scene: str) -> dict:
        if scene not in self._meta_cache:
            with open(os.path.join(self.cfg.root, scene, "meta.json")) as f:
                meta = json.load(f)
            meta["poses"] = np.load(
                os.path.join(self.cfg.root, scene, "poses.npy"))
            meta["packed"] = os.path.exists(
                os.path.join(self.cfg.root, scene, "frames.npy"))
            self._meta_cache[scene] = meta
        return self._meta_cache[scene]

    def _packed(self, scene: str) -> np.ndarray:
        """Memory-mapped [V, T, H, W, 3] uint8 frame bank for the scene."""
        if scene not in self._pack_cache:
            self._pack_cache[scene] = np.load(
                os.path.join(self.cfg.root, scene, "frames.npy"),
                mmap_mode="r")
        return self._pack_cache[scene]

    def materialize_packed(self) -> None:
        """Decode every frame ONCE into in-memory uint8 banks, making a
        decode-based source (PNG folders, tfrecords, shapenet_dir)
        eligible for the HBM-resident path (`data.materialize_packed`).
        Polymorphic over `_read_frame`, so subclasses inherit it. Host RAM
        transiently holds the full dataset (same bytes the device will);
        scenes already packed are untouched."""
        s = self.cfg.image_size
        for scene in self.scenes:
            meta = self._meta(scene)
            if meta.get("packed"):
                continue
            v, t = meta["num_views"], meta["seq_len"]
            bank = np.stack([
                np.stack([self._read_frame(scene, vi, ti)
                          for ti in range(t)]) for vi in range(v)])
            if bank.shape[2:4] != (s, s):     # bank contract: cfg-sized
                bank = self._resize_u8(
                    bank.reshape(v * t, *bank.shape[2:])
                ).reshape(v, t, s, s, 3)
            self._pack_cache[scene] = np.ascontiguousarray(bank)
            meta["packed"] = True

    def _read_frame(self, scene: str, view: int, t: int) -> np.ndarray:
        if self._meta(scene)["packed"]:
            return np.asarray(self._packed(scene)[view, t])
        import imageio.v2 as imageio
        path = os.path.join(self.cfg.root, scene,
                            f"v{view:03d}_t{t:03d}.png")
        return np.asarray(imageio.imread(path))

    def _resize_u8(self, frames: np.ndarray) -> np.ndarray:
        s = self.cfg.image_size
        if frames.shape[1:3] == (s, s):
            return frames
        import cv2
        return np.stack([
            cv2.resize(f, (s, s), interpolation=cv2.INTER_LINEAR)
            for f in frames])

    def sample_indices(self, index: int) \
            -> tuple[int, np.ndarray, np.ndarray, int]:
        """Deterministic draw for example ``index``:
        (scene_i, src_views[T], tgt_views[K], t0). Shared by the host
        decode path (example) and the HBM-resident gather path
        (data.resident) so both produce the identical training stream.

        cfg.src_views="fixed": one camera films the whole sequence
        (src_views is T copies of one draw). "orbit": frame t comes from
        its OWN camera — the sequence carries true multiview evidence
        (distinct views when V >= T), which is what multiflow synthesis
        aggregates."""
        cfg = self.cfg
        scene_i = index % len(self.scenes)
        meta = self._meta(self.scenes[scene_i])
        v_avail, t_avail = meta["num_views"], meta["seq_len"]
        rng = np.random.default_rng(
            np.random.SeedSequence([cfg.seed + 7, int(index)]))
        t_len = min(cfg.seq_len, t_avail)
        k = cfg.num_targets
        if cfg.src_views == "orbit":
            src_views = rng.choice(v_avail, size=t_len,
                                   replace=(v_avail < t_len))
        else:
            src_views = np.full(t_len, rng.integers(v_avail))
        tgt_views = rng.choice(v_avail, size=k, replace=(v_avail < k))
        t0 = int(rng.integers(t_avail - t_len + 1))
        return scene_i, src_views.astype(np.int64), tgt_views, t0

    def example(self, index: int, raw: bool = False) -> dict:
        cfg = self.cfg
        scene_i, src_views, tgt_views, t0 = self.sample_indices(index)
        scene = self.scenes[scene_i]
        meta = self._meta(scene)
        poses = meta["poses"]
        t_avail = meta["seq_len"]
        t_len = min(cfg.seq_len, t_avail)
        s = cfg.image_size
        src_poses = poses[src_views].astype(np.float32)    # [T, P]

        if not raw and meta["packed"]:
            bank = self._packed(scene)                 # [V, T, H, W, 3] mmap
            if bank.shape[2:4] == (s, s):
                # f32 fast path: one C++ gather+normalize straight off the
                # memory-mapped bank (native.gather_pack) — only the
                # selected rows' pages are touched, no per-frame copies.
                flat = bank.reshape(-1, *bank.shape[2:])
                rows = np.concatenate([
                    src_views * t_avail + t0 + np.arange(t_len),
                    np.asarray(tgt_views) * t_avail + t0 + t_len - 1])
                packed = native.gather_pack(flat, rows)
                return {
                    "image_seq": packed[:t_len],
                    "src_poses": src_poses,
                    "tgt_poses": poses[tgt_views].astype(np.float32),
                    "tgt_images": packed[t_len:],
                }

        frames = np.stack([
            self._read_frame(scene, int(src_views[t]), t0 + t)
            for t in range(t_len)])
        targets = np.stack([
            self._read_frame(scene, int(v), t0 + t_len - 1)
            for v in tgt_views])

        if raw:
            # uint8 path: resize on host, normalize on device (pipeline.preprocess)
            image_seq = self._resize_u8(frames)
            tgt_images = self._resize_u8(targets)
        else:
            image_seq = native.resize_normalize_pack(frames, s, s)
            tgt_images = native.resize_normalize_pack(targets, s, s)
        return {
            "image_seq": image_seq,
            "src_poses": src_poses,
            "tgt_poses": poses[tgt_views].astype(np.float32),
            "tgt_images": tgt_images,
        }

    def batch(self, indices, raw: bool = False) -> dict:
        exs = [self.example(int(i), raw=raw) for i in indices]
        return {k: np.stack([e[k] for e in exs]) for k in exs[0]}


class SyntheticFrames(FrameFolderScenes):
    """Disk-free frame-folder view of the procedural renderer.

    Exactly the dataset ``export_synthetic(fmt="packed")`` would write —
    fixed per-scene cameras, [V, T] frame banks — but rendered on first
    access instead of read from disk, so every FrameFolderScenes mechanism
    (orbit ``sample_indices``, ``materialize_packed``, the HBM-resident +
    ``device_sampling`` path) works with zero prior setup. This is what
    ``data.source="frames"`` with an empty ``data.root`` resolves to: the
    flagship ``c3mf`` preset trains out of the box (VERDICT r3 #7), and
    pointing ``data.root`` at a real export upgrades to it seamlessly.
    """

    def __init__(self, cfg: DataConfig):
        self.cfg = cfg
        self.num_views = max(8, cfg.seq_len, cfg.num_targets)
        self._renderer = SyntheticScenes(
            num_scenes=cfg.scene_offset + cfg.num_scenes,
            image_size=cfg.image_size, dynamic=cfg.dynamic, seed=cfg.seed)
        self.scenes = [f"scene_{cfg.scene_offset + i:05d}"
                       for i in range(cfg.num_scenes)]
        self._sid = {name: cfg.scene_offset + i
                     for i, name in enumerate(self.scenes)}
        self._meta_cache: dict[str, dict] = {}
        self._pack_cache: dict[str, np.ndarray] = {}

    def _meta(self, scene: str) -> dict:
        if scene not in self._meta_cache:
            sid = self._sid[scene]
            # per-scene camera draw, seeded like export_synthetic's stream
            rng = np.random.default_rng(
                np.random.SeedSequence([self.cfg.seed + 3, sid]))
            self._meta_cache[scene] = {
                "num_views": self.num_views,
                "seq_len": self.cfg.seq_len,
                "dynamic": self.cfg.dynamic,
                "poses": self._renderer.sample_poses(rng, self.num_views),
                "packed": False,
            }
        return self._meta_cache[scene]

    def _packed(self, scene: str) -> np.ndarray:
        if scene not in self._pack_cache:       # rendered by _read_frame
            raise KeyError(f"{scene} not materialized "
                           "(call materialize_packed)")
        return self._pack_cache[scene]

    def _read_frame(self, scene: str, view: int, t: int) -> np.ndarray:
        if scene in self._pack_cache:
            return np.asarray(self._pack_cache[scene][view, t])
        meta = self._meta(scene)
        return self._renderer.render(self._sid[scene], meta["poses"][view],
                                     time=float(t))


def export_synthetic(root: str, num_scenes: int = 8, image_size: int = 128,
                     num_views: int = 12, seq_len: int = 4,
                     dynamic: bool = True, seed: int = 0,
                     fmt: str = "png", scene_offset: int = 0) -> str:
    """Materialize synthetic scenes as a frame-folder dataset on disk.

    fmt="png": one PNG per frame (exercises real decode work — the
    reference's video-decode stage). fmt="packed": one memory-mappable
    ``frames.npy`` uint8 bank per scene (decode-free production path).
    scene_offset shifts the procedural scene ids — disjoint offsets give
    disjoint scene geometry (held-out-scene evaluation splits).
    """
    src = SyntheticScenes(num_scenes=scene_offset + num_scenes,
                          image_size=image_size, dynamic=dynamic, seed=seed)
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    for i in range(num_scenes):
        sid = scene_offset + i
        sdir = os.path.join(root, f"scene_{sid:05d}")
        os.makedirs(sdir, exist_ok=True)
        poses = src.sample_poses(rng, num_views)
        np.save(os.path.join(sdir, "poses.npy"), poses)
        with open(os.path.join(sdir, "meta.json"), "w") as f:
            json.dump({"num_views": num_views, "seq_len": seq_len,
                       "dynamic": dynamic}, f)
        if fmt == "packed":
            bank = np.stack([
                np.stack([src.render(sid, poses[v], time=float(t))
                          for t in range(seq_len)])
                for v in range(num_views)])          # [V, T, H, W, 3] u8
            np.save(os.path.join(sdir, "frames.npy"), bank)
        else:
            import imageio.v2 as imageio
            for v in range(num_views):
                for t in range(seq_len):
                    img = src.render(sid, poses[v], time=float(t))
                    imageio.imwrite(
                        os.path.join(sdir, f"v{v:03d}_t{t:03d}.png"), img)
    return root
