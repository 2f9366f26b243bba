"""Export trained parameters as a git-committable .npz snapshot.

  python -m qmcnn_tpu.export --ckpt-dir runs/hero_ckpt \
      --out runs/hero_params.npz [--step N] [--field ema]

Orbax checkpoint trees are gitignored and die with the VM (three hero
checkpoints were lost to machine deaths this round, each costing hours of
retraining); the flat {key-path: array} .npz written here is a few hundred
KB for every hero in the suite, so it can be committed. ``run.init_from``
(and ``measure --ckpt-dir``-style warm starts) accept the .npz path
directly — utils/transfer.py matches leaves by key-path + shape, exactly
as for a checkpoint directory.

Reference parity note: the CPU reference (SURVEY.md R13) pickles params
framework-natively; this is the portable equivalent plus the transfer
machinery on load.
"""
from __future__ import annotations

import argparse

import numpy as np

from qmcnn_tpu.utils.transfer import _flatten, load_checkpoint_params


def export_params(source: str, out: str, step=None,
                  field: str = "params") -> dict:
    """Flatten the checkpoint subtree to {key-path: np.array} and savez."""
    if not out.endswith(".npz"):
        raise ValueError(f"--out must end in .npz, got {out!r}")
    tree = load_checkpoint_params(source, step=step, field=field)
    flat = {k: np.asarray(v) for k, v in _flatten(tree).items()}
    if not flat:
        raise ValueError(f"no parameter leaves found in {source}")
    np.savez(out, **flat)
    n_bytes = sum(v.nbytes for v in flat.values())
    print(f"exported {len(flat)} leaves ({n_bytes / 1e6:.2f} MB of "
          f"{field!r}) from {source} -> {out}")
    return flat


def main(argv=None) -> int:
    from qmcnn_tpu.utils.platform import honor_platform_request
    honor_platform_request()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt-dir", required=True,
                   help="checkpoint directory (or an existing .npz to "
                        "re-export)")
    p.add_argument("--out", required=True, help="output .npz path")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default: latest)")
    p.add_argument("--field", default="params", choices=["params", "ema"],
                   help="subtree to export (ema = the Polyak average of "
                        "an optimizer.ema_decay run)")
    args = p.parse_args(argv)
    export_params(args.ckpt_dir, args.out, step=args.step, field=args.field)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
