"""Config-5 input-side benchmark: streamed frame decode -> examples/s/host.

Measures the Grain pipeline (per-process sharding, worker-process decode,
prefetch) over a frames dataset in both encodings:

- png:    real per-frame image decode (the reference's video-decode stage)
- packed: memory-mapped uint8 banks (decode-free production path)

    python benchmarks/input_bench.py --root /tmp/c5_png --workers 0 2

Single JSON line per (root, workers) combination. Host-side only (CPU).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(root: str, workers: int, image_size: int = 256, seq_len: int = 4,
            num_targets: int = 2, batch: int = 4, n_batches: int = 24,
            source: str = "frames") -> dict:
    from dynamic_multiview_3d_tpu.config import DataConfig
    from dynamic_multiview_3d_tpu.data import pipeline as pipeline_lib

    cfg = DataConfig(source=source, root=root, image_size=image_size,
                     seq_len=seq_len, num_targets=num_targets,
                     batch_size=batch, grain_workers=workers, prefetch=4,
                     seed=0)
    it = pipeline_lib.make_grain_iterator(cfg, process_index=0,
                                          process_count=1, num_epochs=None)
    next(it)  # warm-up (worker spawn, first decode)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    dt = time.perf_counter() - t0
    ex_s = n_batches * batch / dt
    return {
        "root": root, "workers": workers, "image_size": image_size,
        "examples_per_sec_per_host": round(ex_s, 1),
        "frames_per_sec_per_host": round(ex_s * (seq_len + num_targets), 1),
    }


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", nargs="+", required=True)
    p.add_argument("--workers", nargs="+", type=int, default=[0, 2])
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--source", default="frames",
                   choices=("frames", "tfrecords", "shapenet_dir"))
    args = p.parse_args(argv)
    for root in args.root:
        for w in args.workers:
            print(json.dumps(measure(root, w, image_size=args.image_size,
                                     source=args.source)),
                  flush=True)


if __name__ == "__main__":
    main()
