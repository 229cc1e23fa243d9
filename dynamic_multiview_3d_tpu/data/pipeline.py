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

from dynamic_multiview_3d_tpu.config import DataConfig
from dynamic_multiview_3d_tpu.data.synthetic import SyntheticScenes


def make_source(cfg: DataConfig):
    if cfg.source == "synthetic":
        return SyntheticScenes(
            num_scenes=cfg.num_scenes, image_size=cfg.image_size,
            seq_len=cfg.seq_len, num_targets=cfg.num_targets,
            dynamic=cfg.dynamic, seed=cfg.seed)
    if cfg.source == "frames":
        from dynamic_multiview_3d_tpu.data.frames import FrameFolderScenes
        return FrameFolderScenes(cfg)
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

    class _Source(grain.RandomAccessDataSource):
        def __len__(self):
            # one nominal epoch = one pass over the scene bank
            return max(cfg.num_scenes, cfg.batch_size)

        def __getitem__(self, idx):
            return source.example(int(idx))

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
