"""Host input pipeline (SURVEY.md T1, replaces R5's feed_dict loop).

Two tiers:
- ``make_source(cfg)``: an indexable example source (``batch(indices)``) —
  pure function of the index, which makes the train loop's data stream a
  function of the step counter (exact resume for free).
- ``make_grain_iterator(cfg)``: Grain-based multi-worker prefetching around
  that source with per-process sharding for multi-host (SURVEY.md §3.3).
  Decode runs in Grain worker processes off the critical path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dynamic_multiview_3d_tpu.config import DataConfig
from dynamic_multiview_3d_tpu.data.synthetic import SyntheticScenes


def preprocess(batch: dict, *, key: jax.Array | None = None,
               targets_per_step: int = 0, index_offset=0) -> dict:
    """On-device, in-step preprocessing (BASELINE.json:5: "fused jax/XLA
    preprocessing ... instead of feed_dict CPU loops").

    Runs INSIDE the jitted train step, so XLA fuses it with the encoder's
    first cast/conv:
    - uint8 -> [-1, 1] float normalization (batches travel host->device as
      uint8: 4x less transfer than float32)
    - optional on-device view-pair sampling: pick ``targets_per_step`` of
      the provided K target views per example, keyed by
      fold_in(data seed, step) then per-example index. ``index_offset`` is
      the GLOBAL index of this shard's first example, so data-parallel
      shards draw independent subsets (and shard_map == auto numerics).
    """
    out = dict(batch)
    for name in ("image_seq", "tgt_images"):
        if name in out and out[name].dtype == jnp.uint8:
            out[name] = out[name].astype(jnp.float32) / 127.5 - 1.0
    k_avail = out["tgt_poses"].shape[1]
    if targets_per_step and key is not None and k_avail > targets_per_step:
        b = out["tgt_poses"].shape[0]
        keys = jax.vmap(jax.random.fold_in, (None, 0))(
            key, index_offset + jnp.arange(b))
        idx = jax.vmap(
            lambda kk: jax.random.permutation(kk, k_avail)[:targets_per_step]
        )(keys)                                             # [B, K']
        take = jax.vmap(lambda x, i: x[i])
        out["tgt_poses"] = take(out["tgt_poses"], idx)
        out["tgt_images"] = take(out["tgt_images"], idx)
    return out


def make_source(cfg: DataConfig):
    if cfg.source == "synthetic":
        return SyntheticScenes(
            num_scenes=cfg.num_scenes, image_size=cfg.image_size,
            seq_len=cfg.seq_len, num_targets=cfg.num_targets,
            dynamic=cfg.dynamic, seed=cfg.seed,
            scene_offset=cfg.scene_offset, src_views=cfg.src_views)
    if cfg.source == "frames":
        from dynamic_multiview_3d_tpu.data.frames import (FrameFolderScenes,
                                                          SyntheticFrames)
        if not cfg.root:
            # no export on disk: render the identical layout procedurally
            # (fixed per-scene cameras, packed-bank protocol) so frames
            # presets — c3mf in particular — run with zero prior setup.
            import warnings
            warnings.warn(
                "data.source='frames' with empty data.root: using the "
                "in-memory synthetic frame bank (SyntheticFrames); point "
                "data.root at a cli.make_dataset export for real data",
                stacklevel=2)
            return SyntheticFrames(cfg)
        return FrameFolderScenes(cfg)
    if cfg.source == "tfrecords":
        from dynamic_multiview_3d_tpu.data.tfrecords import TFRecordScenes
        return TFRecordScenes(cfg)
    if cfg.source == "shapenet_dir":
        from dynamic_multiview_3d_tpu.data.shapenet import ShapeNetDirScenes
        return ShapeNetDirScenes(cfg)
    raise ValueError(f"unknown data source: {cfg.source}")


def make_grain_iterator(cfg: DataConfig, *, process_index: int | None = None,
                        process_count: int | None = None,
                        num_epochs: int | None = None):
    """Grain pipeline: shard by process -> decode in workers -> batch -> prefetch.

    Yields per-host batches of size cfg.batch_size // process_count; the
    train loop assembles them into global arrays
    (parallel.mesh.shard_batch). Iterator is checkpointable via
    ``iter.get_state()/set_state()`` (grain built-in).
    """
    import grain.python as grain

    pidx = jax.process_index() if process_index is None else process_index
    pcnt = jax.process_count() if process_count is None else process_count
    if cfg.batch_size % pcnt:
        raise ValueError(f"batch {cfg.batch_size} not divisible by "
                         f"{pcnt} processes")
    source = make_source(cfg)

    raw = cfg.device_preprocess
    # probe the raw-path support once — never mask TypeErrors from example()
    import inspect
    has_raw = "raw" in inspect.signature(source.example).parameters
    # one nominal epoch = one pass over the scene bank; frames datasets know
    # their true on-disk scene count
    num_records = max(len(getattr(source, "scenes", ())),
                      getattr(source, "num_scenes", 0),
                      cfg.batch_size)

    class _Source(grain.RandomAccessDataSource):
        def __len__(self):
            return num_records

        def __getitem__(self, idx):
            if has_raw:
                return source.example(int(idx), raw=raw)
            return source.example(int(idx))

        def __repr__(self):
            # stable across processes: grain validates repr(data_source)
            # when restoring iterator state
            return (f"DMV3DSource(source={cfg.source!r}, n={len(self)}, "
                    f"seed={cfg.seed}, size={cfg.image_size})")

    sampler = grain.IndexSampler(
        num_records=len(_Source()),
        shard_options=grain.ShardOptions(shard_index=pidx, shard_count=pcnt,
                                         drop_remainder=True),
        shuffle=True,
        num_epochs=num_epochs,
        seed=cfg.seed,
    )
    loader = grain.DataLoader(
        data_source=_Source(),
        sampler=sampler,
        operations=[grain.Batch(cfg.batch_size // pcnt,
                                drop_remainder=True)],
        worker_count=cfg.grain_workers,
        read_options=grain.ReadOptions(prefetch_buffer_size=cfg.prefetch),
    )
    return iter(loader)
