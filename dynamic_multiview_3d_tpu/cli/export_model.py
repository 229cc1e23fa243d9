"""Export a checkpoint as a self-contained serving artifact.

    python -m dynamic_multiview_3d_tpu.cli.export_model \
        --ckpt /runs/model --out /serve/model.dmv3d \
        --batch 1 --num-targets 8 [--platforms tpu cpu]

The artifact (StableHLO + weights + config, see ``serving.py``) is the
frozen-graph analog of the TF1 reference: a server loads it with jax +
numpy only — no model code, no checkpoint machinery.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--seq-len", type=int, nargs="+", default=None,
                   help="source frame count(s) T (default: the checkpoint's "
                        "data.seq_len). Several values export one StableHLO "
                        "signature per T into the same artifact — the loader "
                        "dispatches on image_seq.shape[1] (shared-head "
                        "checkpoints only; baked heads fail at trace time "
                        "for any T but the trained one)")
    p.add_argument("--num-targets", type=int, default=1)
    p.add_argument("--platforms", nargs="*", default=(),
                   help="lowering targets (e.g. tpu cpu); default: the "
                        "current backend")
    args = p.parse_args(argv)

    from dynamic_multiview_3d_tpu import serving
    from dynamic_multiview_3d_tpu.api import Model
    model = Model.from_checkpoint(args.ckpt)
    seq_len = args.seq_len
    if seq_len is not None:
        seq_len = seq_len[0] if len(seq_len) == 1 else tuple(seq_len)
    manifest = serving.export_predict(
        model, args.out, batch=args.batch, seq_len=seq_len,
        num_targets=args.num_targets, platforms=tuple(args.platforms))
    print(json.dumps({"out": args.out, **manifest}))


if __name__ == "__main__":
    main()
