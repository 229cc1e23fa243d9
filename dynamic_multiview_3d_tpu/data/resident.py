"""HBM-resident dataset mode (T1, TPU-first input pipeline).

The packed uint8 frame banks live ON DEVICE for the whole run: they are
uploaded once at startup, and the per-step host->device traffic is a few
hundred bytes of int32 indices instead of megabytes of pixels. The gather
(frames[scene, view, t]) runs inside the jitted train step and XLA fuses it
with the uint8->float normalize (pipeline.preprocess).

Why this exists (two independent reasons, both measured — BASELINE.md):

1. Throughput: removes the per-step H2D transfer from the critical path
   entirely. Through this sandbox's ~25 MB/s relay link that transfer was
   the training bottleneck (c2-shape batches cap at ~11 steps/s); on real
   hosts it still frees PCIe/DMA bandwidth and host RAM page traffic.
2. Robustness: the axon relay plugin on this machine leaks every
   host->device transfer buffer host-side (~batch bytes per step, ~2.3 MB
   at c2 shapes — an 80k-step run OOM-killed a 128 GB host; verified with
   a device_put microbench: u8 196 KB array -> 196 KB leaked per call,
   zero leak with the plugin off the path). Shipping only indices bounds
   the leak to KB/step regardless of the plugin.

Semantics parity: sampling reuses FrameFolderScenes.sample_indices, so the
resident stream is example-for-example identical to the host decode path
(asserted in tests/test_data.py).

Reference parity note: the reference kept its dataset in host RAM and fed
slices via feed_dict (SURVEY.md R5); the TPU-native equivalent of "the
dataset is already where the compute is" is HBM residency.
"""

from __future__ import annotations

import numpy as np

from dynamic_multiview_3d_tpu.config import DataConfig


def fits_budget(source, cfg: DataConfig, num_shards: int = 1) -> bool:
    """True when every scene is packed, uniform, and the stacked bank fits
    cfg.resident_budget_mb (per shard: scene-sharded banks divide the
    per-device HBM cost by the 'data' mesh size)."""
    try:
        metas = [source._meta(s) for s in source.scenes]
    except (OSError, KeyError, ValueError, AttributeError):
        # expected ineligibility: missing/corrupt meta files or a source
        # without the packed-bank protocol. Anything else should surface.
        return False
    if not all(m.get("packed") for m in metas):
        return False
    v0, t0 = metas[0]["num_views"], metas[0]["seq_len"]
    if not all(m["num_views"] == v0 and m["seq_len"] == t0 for m in metas):
        return False
    s = cfg.image_size
    total = len(source.scenes) * v0 * t0 * s * s * 3
    return total / max(1, num_shards) <= cfg.resident_budget_mb * 1024 * 1024


class ResidentFrames:
    """Device-resident view of a packed FrameFolderScenes dataset.

    ``index_batch(step)`` -> tiny int32 arrays (the only per-step H2D);
    ``gather(frames, poses, idx)`` -> the standard batch dict, traced
    inside the jitted step against the resident banks.
    """

    def __init__(self, source, cfg: DataConfig, sharding=None,
                 num_shards: int = 1):
        """num_shards > 1 = scene-sharded mode (cfg.resident_sharding
        'scenes'): the flat row tables are sharded along their leading axis
        over the 'data' mesh axis; ``sharding`` must then be the
        NamedSharding(mesh, P('data')). Each shard holds (and trains on)
        its contiguous scene subset; per-device HBM divides by the mesh
        size. Rows are materialized shard-by-shard via
        make_array_from_callback, so a multi-host process only ever builds
        its own scenes' pixels."""
        import jax

        self.cfg = cfg
        self.source = source
        self.num_shards = num_shards
        metas = [source._meta(s) for s in source.scenes]
        self.num_views = v = metas[0]["num_views"]
        self.t_avail = t = metas[0]["seq_len"]
        self.t_len = min(cfg.seq_len, self.t_avail)
        s = cfg.image_size
        s_total = len(source.scenes)
        if s_total % num_shards:
            raise ValueError(
                f"resident_sharding='scenes' needs the scene count "
                f"({s_total}) divisible by the data mesh size ({num_shards})")
        # local scene count drives the in-step sampler in sharded mode
        self.num_scenes = s_total // num_shards

        def load_scene(i: int) -> np.ndarray:             # -> [V*T, s, s, 3]
            bank = np.asarray(source._packed(source.scenes[i]))
            if bank.shape[2:4] != (s, s):
                bank = source._resize_u8(
                    bank.reshape(v * t, *bank.shape[2:])).reshape(
                        v, t, s, s, 3)
            return bank.reshape(v * t, s, s, 3)

        rows = s_total * v * t
        self.nbytes = rows * s * s * 3
        poses_host = np.concatenate(
            [m["poses"][:v] for m in metas]).astype(np.float32)  # [S*V, P]

        if num_shards == 1:
            frames_host = np.concatenate(
                [load_scene(i) for i in range(s_total)])
            if sharding is not None:
                self.frames = jax.device_put(frames_host, sharding)
                self.poses = jax.device_put(poses_host, sharding)
            else:
                self.frames = jax.device_put(frames_host)
                self.poses = jax.device_put(poses_host)
            del frames_host            # host copy is dead after upload
            return

        rows_per_scene = v * t

        def frames_cb(index):
            lo = 0 if index[0].start is None else index[0].start
            hi = rows if index[0].stop is None else index[0].stop
            assert lo % rows_per_scene == 0 and hi % rows_per_scene == 0, \
                "shard boundary must align to scene boundaries"
            return np.concatenate([
                load_scene(i) for i in range(lo // rows_per_scene,
                                             hi // rows_per_scene)])

        def poses_cb(index):
            return poses_host[index]

        self.frames = jax.make_array_from_callback(
            (rows, s, s, 3), sharding, frames_cb)
        self.poses = jax.make_array_from_callback(
            poses_host.shape, sharding, poses_cb)

    def _flat(self, scene_i: int, view, t) -> np.ndarray:
        return (np.asarray(scene_i) * self.num_views
                + np.asarray(view)) * self.t_avail + np.asarray(t)

    def index_batch(self, indices) -> dict:
        """Host side: the same draws as FrameFolderScenes.example, reduced
        to flat row indices. ~16 bytes/example instead of the pixels."""
        if self.num_shards > 1:
            raise ValueError(
                "scene-sharded residency has no host index path — global "
                "row ids cannot address a shard-local bank; use "
                "data.device_sampling")
        seq_idx, tgt_idx, src_pose_idx, tgt_pose_idx = [], [], [], []
        for index in indices:
            scene_i, src_views, tgt_views, t0 = \
                self.source.sample_indices(int(index))
            ts = t0 + np.arange(self.t_len)
            seq_idx.append(self._flat(scene_i, src_views, ts))
            tgt_idx.append(self._flat(scene_i, tgt_views,
                                      t0 + self.t_len - 1))
            src_pose_idx.append(scene_i * self.num_views + src_views)
            tgt_pose_idx.append(scene_i * self.num_views + tgt_views)
        return {
            "seq_idx": np.asarray(seq_idx, np.int32),          # [B, T]
            "tgt_idx": np.asarray(tgt_idx, np.int32),          # [B, K]
            "src_pose_idx": np.asarray(src_pose_idx, np.int32),  # [B, T]
            "tgt_pose_idx": np.asarray(tgt_pose_idx, np.int32),  # [B, K]
        }

    def sample_meta(self) -> dict:
        """Static shape facts the device-side sampler needs."""
        return {"num_scenes": self.num_scenes, "num_views": self.num_views,
                "t_avail": self.t_avail, "t_len": self.t_len,
                "num_targets": self.cfg.num_targets,
                "orbit": self.cfg.src_views == "orbit"}

    @staticmethod
    def device_sample(frames, poses, meta: dict, key, batch: int,
                      index_offset=0) -> dict:
        """Fully on-device example sampling + gather (data.device_sampling).

        Draws (scene, src_view, K target views, t0) per example from
        ``fold_in(key, global_example_index)`` — a pure function of the
        step counter, so exact resume is preserved and data-parallel
        shards draw independent examples (``index_offset`` = this shard's
        first global row, as in pipeline.preprocess). With this, a train
        dispatch consumes NO host input at all: the loop's only job is
        scheduling dispatches and checkpoints. The stream differs from the
        host sample_indices stream (jax vs numpy rng) — both are seeded,
        documented, and resumable.
        """
        import jax
        import jax.numpy as jnp

        s, v = meta["num_scenes"], meta["num_views"]
        t_avail, t_len, k = meta["t_avail"], meta["t_len"], \
            meta["num_targets"]
        orbit = meta.get("orbit", False)

        def draw(kk):
            k1, k2, k3, k4 = jax.random.split(kk, 4)
            scene = jax.random.randint(k1, (), 0, s)
            if orbit:        # one camera per frame: true multiview evidence
                if v >= t_len:
                    src_views = jax.random.permutation(k2, v)[:t_len]
                else:
                    src_views = jax.random.randint(k2, (t_len,), 0, v)
            else:
                src_views = jnp.broadcast_to(
                    jax.random.randint(k2, (), 0, v), (t_len,))
            if v >= k:       # without replacement, like the host sampler
                tgt_views = jax.random.permutation(k3, v)[:k]
            else:
                tgt_views = jax.random.randint(k3, (k,), 0, v)
            t0 = jax.random.randint(k4, (), 0, t_avail - t_len + 1)
            seq_rows = (scene * v + src_views) * t_avail + t0 + \
                jnp.arange(t_len)
            tgt_rows = (scene * v + tgt_views) * t_avail + t0 + t_len - 1
            return (seq_rows, tgt_rows, scene * v + src_views,
                    scene * v + tgt_views)

        keys = jax.vmap(jax.random.fold_in, (None, 0))(
            key, index_offset + jnp.arange(batch))
        seq_idx, tgt_idx, src_pose_idx, tgt_pose_idx = jax.vmap(draw)(keys)
        return ResidentFrames.gather(frames, poses, {
            "seq_idx": seq_idx, "tgt_idx": tgt_idx,
            "src_pose_idx": src_pose_idx, "tgt_pose_idx": tgt_pose_idx})

    @staticmethod
    def gather(frames, poses, idx: dict) -> dict:
        """Traced inside the jitted step: resident rows -> standard batch.

        Returns uint8 images (pipeline.preprocess normalizes in-step, same
        as the host uint8 path)."""
        import jax.numpy as jnp

        seq = jnp.take(frames, idx["seq_idx"], axis=0)     # [B, T, H, W, 3]
        tgt = jnp.take(frames, idx["tgt_idx"], axis=0)     # [B, K, H, W, 3]
        src_poses = jnp.take(poses, idx["src_pose_idx"], axis=0)  # [B, T, P]
        tgt_poses = jnp.take(poses, idx["tgt_pose_idx"], axis=0)  # [B, K, P]
        return {"image_seq": seq, "src_poses": src_poses,
                "tgt_poses": tgt_poses, "tgt_images": tgt}
