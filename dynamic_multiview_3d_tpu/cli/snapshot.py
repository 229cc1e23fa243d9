"""Export an eval-ready model dir from an intermediate training checkpoint.

    python -m dynamic_multiview_3d_tpu.cli.snapshot \
        --ckpt-dir /tmp/run_ckpts --out /tmp/run_model [--step 12000]

The training loop only writes the ``Model.from_checkpoint``-format export
(``<ckpt_dir>/model``) when it reaches ``train.num_steps``; a run cut short
by preemption leaves only Orbax manager steps behind. This tool restores any
manager step and re-exports it via ``checkpoint.save_model`` using the
``train_config.json`` the loop persists at startup — the recovery half of
the restart-from-checkpoint failure policy (SURVEY.md §5), for when you want
to *evaluate* the survivor rather than resume it.

Mirrors the end-of-run export: exports ``ema_params`` when the state carries
them (train.ema_decay > 0), else raw ``params``.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt-dir", required=True,
                   help="a train.ckpt_dir with Orbax manager steps")
    p.add_argument("--out", required=True,
                   help="destination model dir (Model.from_checkpoint format)")
    p.add_argument("--step", type=int, default=None,
                   help="manager step to export (default: latest)")
    args = p.parse_args(argv)

    import orbax.checkpoint as ocp

    from dynamic_multiview_3d_tpu import config as config_lib
    from dynamic_multiview_3d_tpu.train import checkpoint as ckpt_lib

    ckpt_dir = os.path.abspath(args.ckpt_dir)
    cfg_path = os.path.join(ckpt_dir, "train_config.json")
    if not os.path.exists(cfg_path):
        p.error(f"{cfg_path} not found — the run predates train_config.json "
                "persistence; re-export with an explicit config instead")
    with open(cfg_path) as f:
        cfg = config_lib.from_dict(json.load(f))

    step = args.step
    if step is None:
        steps = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
        if not steps:
            p.error(f"no manager steps under {ckpt_dir}")
        step = max(steps)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.join(ckpt_dir, str(step), "default"))
    params = restored.get("ema_params") or restored["params"]
    ckpt_lib.save_model(args.out, params, cfg, int(step))
    print(json.dumps({"out": os.path.abspath(args.out), "step": int(step),
                      "ema": bool(restored.get("ema_params"))}))


if __name__ == "__main__":
    main()
