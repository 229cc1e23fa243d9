"""Train a DMV3D model.

    python -m dynamic_multiview_3d_tpu.cli.train --preset c2 \
        --set train.num_steps=1000 --set data.batch_size=16 \
        --logdir /tmp/dmv3d_logs

Replaces the reference's tf.app.flags train.py (SURVEY.md R19).
"""

from __future__ import annotations

import argparse

from dynamic_multiview_3d_tpu import config as config_lib


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="default",
                   choices=sorted(config_lib.PRESETS))
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="a.b=v", help="config override, repeatable")
    p.add_argument("--logdir", default="/tmp/dmv3d_logs")
    p.add_argument("--parallel-mode", default="shard_map",
                   choices=["shard_map", "auto"])
    p.add_argument("--profile-dir", default=None,
                   help="capture an xprof trace of a few steps here")
    p.add_argument("--profile-steps", nargs=2, type=int, default=(10, 15),
                   metavar=("START", "STOP"),
                   help="step window traced into --profile-dir (snaps to "
                        "dispatch boundaries when steps_per_dispatch > 1)")
    p.add_argument("--debug-nans", action="store_true",
                   help="run under jax_debug_nans: raise at the first op "
                        "that produces a NaN (utils.debugging.debug_mode)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    cfg = config_lib.get_config(args.preset, args.overrides)

    import contextlib

    from dynamic_multiview_3d_tpu.train import loop as loop_lib
    from dynamic_multiview_3d_tpu.train import metrics as metrics_lib
    from dynamic_multiview_3d_tpu.utils import debugging

    writer = metrics_lib.MetricsWriter(args.logdir)
    guard = (debugging.debug_mode() if args.debug_nans
             else contextlib.nullcontext())
    try:
        with guard:
            state, metrics = loop_lib.train(
                cfg, writer=writer, parallel_mode=args.parallel_mode,
                profile_dir=args.profile_dir,
                profile_steps=tuple(args.profile_steps))
        print({k: round(v, 5) for k, v in metrics.items()})
    finally:
        writer.close()


if __name__ == "__main__":
    main()
