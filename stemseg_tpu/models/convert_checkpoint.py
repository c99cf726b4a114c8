"""CLI: convert a reference PyTorch checkpoint to our .ckpt format.

    python -m stemseg_tpu.models.convert_checkpoint ref.pth out.ckpt \
        --cfg davis_1

The output is a weights-only session checkpoint loadable by
``--initial_ckpt`` (training) or directly by the inference CLI (which can
also consume ``.pth`` files on the fly — this tool just avoids re-converting
per run and validates the mapping once).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="Convert reference .pth -> .ckpt")
    parser.add_argument("torch_ckpt")
    parser.add_argument("output")
    parser.add_argument("--cfg", default=None,
                        help="preset name or YAML path (default: config.yaml "
                             "next to the checkpoint, else defaults)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import serialization

    from stemseg_tpu.config import default_config, load_config, load_preset
    from stemseg_tpu.models import build_model
    from stemseg_tpu.models.converter import (
        convert_state_dict,
        load_torch_state_dict,
        merge_variables,
    )

    if args.cfg and os.path.exists(args.cfg):
        cfg = load_config(args.cfg)
    elif args.cfg:
        cfg = load_preset(args.cfg)
    else:
        sidecar = os.path.join(os.path.dirname(args.torch_ckpt), "config.yaml")
        cfg = load_config(sidecar) if os.path.exists(sidecar) else default_config()

    model = build_model(cfg, for_training=False)
    init_vars = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, cfg.input.num_frames, 64, 96, 3)))
    variables = merge_variables(init_vars,
                                convert_state_dict(load_torch_state_dict(args.torch_ckpt)))

    payload = {
        "state": serialization.to_state_dict(
            {"params": jax.tree.map(np.asarray, variables["params"]),
             "constants": jax.tree.map(np.asarray, variables["constants"])}),
        "extra": {"source": os.path.abspath(args.torch_ckpt)},
        "step": 0,
    }
    with open(args.output, "wb") as fh:
        fh.write(serialization.msgpack_serialize(payload))
    n_params = sum(int(np.prod(np.shape(p)))
                   for p in jax.tree.leaves(variables["params"]))
    print(f"Converted {n_params:,}-param checkpoint -> {args.output}")


if __name__ == "__main__":
    main()
