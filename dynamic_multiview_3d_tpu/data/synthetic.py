"""Procedural ShapeNet-style renderings with exact camera poses.

No dataset ships with this machine (SURVEY.md §7 M2), so train/eval data is a
seeded procedural renderer: each scene is a few shaded cuboids; cameras sit on
a look-at sphere parameterized by (azimuth, elevation, radius) — the same pose
convention as ops/pose.py (cross-checked in tests). Dynamic scenes spin the
cuboids over the frame sequence.

Everything here is host-side numpy/OpenCV — it runs inside Grain worker
processes; no JAX. Layout matches the reference's data stage (SURVEY.md
R1-R4): decode -> resize -> normalize to [-1,1] -> pose parse -> view-pair
sampling.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

# Cuboid topology: 8 corners as +-1 signs; 6 faces as corner index quads.
_CORNERS = np.array(
    [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
    np.float32)
_FACES = np.array([
    [0, 1, 3, 2], [4, 5, 7, 6],   # x-, x+
    [0, 1, 5, 4], [2, 3, 7, 6],   # y-, y+
    [0, 2, 6, 4], [1, 3, 7, 5],   # z-, z+
])
_LIGHT = np.array([0.5, 0.3, 0.8], np.float32)
_LIGHT /= np.linalg.norm(_LIGHT)


def look_at_np(pose: np.ndarray) -> np.ndarray:
    """Numpy mirror of ops.pose.look_at_extrinsics (tested for agreement)."""
    az, el, r = float(pose[0]), float(pose[1]), float(pose[2])
    eye = np.array([r * np.cos(el) * np.cos(az),
                    r * np.cos(el) * np.sin(az),
                    r * np.sin(el)], np.float32)
    center = np.zeros(3, np.float32)
    fwd = center - eye
    fwd = fwd / (np.linalg.norm(fwd) + 1e-9)
    up = np.array([0.0, 0.0, 1.0], np.float32)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right) + 1e-9
    down = np.cross(fwd, right)
    rot = np.stack([right, down, fwd])
    t = np.eye(4, dtype=np.float32)
    t[:3, :3] = rot
    t[:3, 3] = -rot @ eye
    return t


def _rot_z(theta: float) -> np.ndarray:
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


class SyntheticScenes:
    """Deterministic procedural scene bank.

    render(scene_id, pose, time) -> uint8 [H, W, 3];
    example(index) -> the full training example a Grain source yields.
    """

    def __init__(self, num_scenes: int = 512, image_size: int = 128,
                 seq_len: int = 1, num_targets: int = 1, dynamic: bool = False,
                 seed: int = 0, radius: float = 2.0, scene_offset: int = 0,
                 src_views: str = "fixed"):
        if not _HAS_CV2:
            raise RuntimeError("opencv required for the synthetic renderer")
        self.num_scenes = num_scenes
        self.src_views = src_views
        self.image_size = image_size
        self.seq_len = seq_len
        self.num_targets = num_targets
        self.dynamic = dynamic
        self.seed = seed
        self.radius = radius
        # scene_offset shifts the procedural scene-id range: disjoint
        # offsets give geometrically disjoint scene banks (the held-out-
        # SCENE evaluation split — not merely held-out view indices).
        self.scene_offset = scene_offset
        self.focal = float(image_size)
        self.c = (image_size - 1) / 2.0

    # -- scene construction ------------------------------------------------
    def scene_params(self, scene_id: int) -> dict:
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, int(scene_id)]))
        n_boxes = int(rng.integers(2, 5))
        return {
            "center": rng.uniform(-0.45, 0.45, (n_boxes, 3)).astype(np.float32),
            "size": rng.uniform(0.12, 0.33, (n_boxes, 3)).astype(np.float32),
            "color": rng.uniform(0.25, 1.0, (n_boxes, 3)).astype(np.float32),
            "spin": rng.uniform(0.15, 0.5, (n_boxes,)).astype(np.float32)
                    * rng.choice([-1.0, 1.0], n_boxes).astype(np.float32),
            "bg": rng.uniform(0.02, 0.12, (3,)).astype(np.float32),
        }

    # -- rasterization -----------------------------------------------------
    def render(self, scene_id: int, pose: np.ndarray, time: float = 0.0
               ) -> np.ndarray:
        p = self.scene_params(scene_id)
        hw = self.image_size
        img = np.empty((hw, hw, 3), np.float32)
        img[:] = p["bg"]
        # vertical background gradient so even empty regions carry pose signal
        img *= np.linspace(0.8, 1.2, hw, dtype=np.float32)[:, None, None]

        w2c = look_at_np(np.asarray(pose, np.float32))
        quads = []  # (depth, poly2d, shade_color)
        for b in range(p["center"].shape[0]):
            spin = p["spin"][b] * time if self.dynamic else 0.0
            rot = _rot_z(spin)
            corners = (_CORNERS * p["size"][b]) @ rot.T + p["center"][b]
            cam = corners @ w2c[:3, :3].T + w2c[:3, 3]
            if np.any(cam[:, 2] <= 0.05):
                continue
            uv = cam[:, :2] / cam[:, 2:3] * self.focal + self.c
            for f_idx, face in enumerate(_FACES):
                pts3 = corners[face]
                # outward normal in world space
                normal = np.cross(pts3[1] - pts3[0], pts3[3] - pts3[0])
                nn = np.linalg.norm(normal)
                if nn < 1e-9:
                    continue
                normal /= nn
                if np.dot(normal, pts3[0] - p["center"][b]) < 0:
                    normal = -normal
                # backface cull in camera space
                cam_n = w2c[:3, :3] @ normal
                cam_c = cam[face].mean(0)
                if np.dot(cam_n, cam_c) >= 0:
                    continue
                shade = 0.35 + 0.65 * max(0.0, float(np.dot(normal, _LIGHT)))
                quads.append((float(cam[face][:, 2].mean()),
                              uv[face], p["color"][b] * shade))
        quads.sort(key=lambda q: -q[0])  # far to near
        for _, poly, color in quads:
            cv2.fillConvexPoly(
                img, np.round(poly).astype(np.int32),
                tuple(float(x) for x in color), lineType=cv2.LINE_AA)
        return (np.clip(img, 0.0, 1.0) * 255.0).astype(np.uint8)

    # -- pose sampling (SURVEY.md R4 view-pair sampler) ----------------------
    def sample_poses(self, rng: np.random.Generator, n: int) -> np.ndarray:
        az = rng.uniform(0.0, 2 * np.pi, n)
        el = rng.uniform(0.1, 0.6, n)
        return np.stack(
            [az, el, np.full(n, self.radius)], axis=-1).astype(np.float32)

    def example(self, index: int, raw: bool = False) -> dict:
        """One training example: source sequence + target views + poses.

        raw=True keeps images uint8 — normalization then happens on-device
        inside the jitted train step (data.pipeline.preprocess), quartering
        host->device transfer vs float32.
        """
        scene_id = self.scene_offset + index % self.num_scenes
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed + 1, int(index)]))
        t_len, k = self.seq_len, self.num_targets

        src_poses = self.sample_poses(rng, t_len)
        if t_len > 1 and self.src_views == "orbit":
            # true multiview evidence: independent cameras per frame,
            # sorted by azimuth so the sequence still reads as a sweep
            src_poses = src_poses[np.argsort(src_poses[:, 0])]
        elif t_len > 1:
            # a gentle camera orbit across the sequence (video-like)
            base = src_poses[0]
            drift = rng.uniform(-0.15, 0.15)
            src_poses = np.stack([
                [base[0] + drift * t, base[1], base[2]] for t in range(t_len)
            ]).astype(np.float32)
        tgt_poses = self.sample_poses(rng, k)

        t_final = float(t_len - 1)
        frames = np.stack([
            self.render(scene_id, src_poses[t], time=float(t))
            for t in range(t_len)
        ])
        targets = np.stack([
            self.render(scene_id, tgt_poses[j], time=t_final)
            for j in range(k)
        ])
        convert = (lambda x: x) if raw else to_model
        return {
            "image_seq": convert(frames),           # [T, H, W, 3]
            "src_poses": src_poses,                 # [T, 3]
            "tgt_poses": tgt_poses,                 # [K, 3]
            "tgt_images": convert(targets),         # [K, H, W, 3]
        }

    def batch(self, indices, raw: bool = False) -> dict:
        exs = [self.example(int(i), raw=raw) for i in indices]
        return {k: np.stack([e[k] for e in exs]) for k in exs[0]}


def to_model(img_u8: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float32 [-1,1] (reference normalization, R2)."""
    return (img_u8.astype(np.float32) / 127.5) - 1.0


def to_uint8(img: np.ndarray) -> np.ndarray:
    return np.clip(np.round((np.asarray(img, np.float32) + 1.0) * 127.5),
                   0, 255).astype(np.uint8)
