"""Checkpoint converter CLI — the `convert_to_deit.py` equivalent plus full
torch->Flax materialization.

  python -m ssl4gie_tpu.cli.convert --input moco_checkpoint.pth.tar \
      --arch vit_b --output converted_ckpt/

Ingests any of the five reference formats (raw timm-named state dict,
{'model'|'state_dict': ...} wrappers, DDP 'module.'/'module.base_encoder.'
prefixes, torchvision RN50, timm AugReg npz) and writes an Orbax checkpoint whose
'backbone' subtree loads 1:1 into every task model here (SURVEY §5.4).
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help=".pth/.pth.tar/.npz checkpoint")
    p.add_argument("--arch", default="vit_b", choices=["vit_b", "resnet50"])
    p.add_argument("--output", required=True, help="Orbax output directory")
    args = p.parse_args()

    from ssl4gie_tpu.convert.loaders import _load_torch_sd, jax_to_mutable
    from ssl4gie_tpu.convert.torch_names import (resnet_torch_to_flax,
                                                 vit_flax_from_augreg_npz,
                                                 vit_torch_to_flax)

    if args.input.endswith(".npz"):
        params, n = vit_flax_from_augreg_npz(np.load(args.input))
        stats = {}
    else:
        sd = _load_torch_sd(args.input)
        if args.arch == "vit_b":
            params, n = vit_torch_to_flax(sd)
            stats = {}
        else:
            params, stats, n = resnet_torch_to_flax(sd)
    print(f"converted {n} tensors")

    import orbax.checkpoint as ocp
    tree = {"params": {"backbone": params}, "meta": {"epoch": 0}}
    if stats:
        tree["batch_stats"] = {"backbone": stats}
    path = os.path.abspath(args.output)
    ocp.StandardCheckpointer().save(path, tree, force=True)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
