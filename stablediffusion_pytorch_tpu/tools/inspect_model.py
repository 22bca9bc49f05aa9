"""Model inspection + StableHLO export CLI.

Usage: ``python -m stablediffusion_pytorch_tpu.tools.inspect_model
--model dit_12l [--export model.stablehlo] [--shapes]``

The TPU-native counterpart of reference inspect_model_onnx.py (584 LoC:
torch.fx symbolic trace + ShapeProp structure graphs, optional ONNX export).
In the XLA world the portable artifact is StableHLO: ``jax.export`` gives a
serialized, version-stable module; the structure dump comes from the nnx
graph walk with traced shapes.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
from flax import nnx

from stablediffusion_pytorch_tpu.cim.progressive import ProgressiveTrain
from stablediffusion_pytorch_tpu.models import DIT, Unet
from stablediffusion_pytorch_tpu.tools.train_qat import MODEL_PRESETS


def export_stablehlo(fn, *example_args) -> bytes:
    """Serialize a jittable fn to portable StableHLO bytes (jax.export)."""
    from jax import export as jexport

    exported = jexport.export(jax.jit(fn))(*example_args)
    return exported.serialize()


def structure_report(model, example_input, *args, **kwargs) -> str:
    """Layer tree with per-layer input shapes (the reference's
    fx ShapeProp analogue)."""
    pt = ProgressiveTrain(model)
    ops = pt.gen_ops_dict(example_input, *args, **kwargs)
    lines = [pt.model_info(), "", "per-layer input shapes:"]
    for name, info in ops.items():
        lines.append(f"  {name:55s} {str(info['input_shape']):24s} "
                     f"{info['layer']}")
    return "\n".join(lines)


def main():
    parser = argparse.ArgumentParser(description="Inspect / export model")
    parser.add_argument("--model", choices=sorted(MODEL_PRESETS),
                        default="dit_12l")
    parser.add_argument("--export", default=None,
                        help="write serialized StableHLO to this path")
    parser.add_argument("--shapes", action="store_true",
                        help="print the structure/shape report")
    parser.add_argument("--batch", type=int, default=1)
    args = parser.parse_args()

    cfg = MODEL_PRESETS[args.model]()
    z = cfg.autoencoder_params["z_channels"]
    if "dit_model_config" in cfg:
        model = DIT(z, dict(cfg.dit_model_config), rngs=nnx.Rngs(0))
    else:
        model = Unet(z, dict(cfg.diffusion_model_config), rngs=nnx.Rngs(0))

    x = jnp.zeros((args.batch, 32, 32, z))
    t = jnp.zeros((args.batch,), jnp.int32)
    cond = {"image": jnp.zeros((args.batch, 512, 512, 18))}

    if args.shapes:
        print(structure_report(model, x, t, cond))

    if args.export:
        graphdef, state = nnx.split(model)
        # jax.export can't serialize nnx.Param pytree nodes — pass the
        # state as a flat list of arrays and rebuild inside the function
        leaves, treedef = jax.tree.flatten(state)

        def fn(leaves, x, t, mask):
            st = jax.tree.unflatten(treedef, leaves)
            return nnx.merge(graphdef, st)(x, t, {"image": mask})

        data = export_stablehlo(fn, leaves, x, t, cond["image"])
        with open(args.export, "wb") as f:
            f.write(data)
        print(f"wrote {len(data):,} bytes of StableHLO to {args.export}")


if __name__ == "__main__":
    main()
