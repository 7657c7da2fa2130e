#!/usr/bin/env python
"""Convert a REFERENCE torch checkpoint into this framework's msgpack
pytree format, using the exact parity-tested architecture converters
(utils/torch_convert.pour_reference_checkpoint).

The output pair (params_<name>.ckpt / state_<name>.ckpt) follows the
from_hparams Pretrainer convention, so a converted HF snapshot drops
straight into an inference savedir.

Example (ECAPA speaker embedder from spkrec-ecapa-voxceleb):
    python tools/convert_checkpoint.py \
        --module speechbrain_tpu.lobes.models.ECAPA_TDNN.ECAPA_TDNN \
        --kwargs '{"lin_neurons": 192, "channels": [1024, 1024, 1024, 1024, 3072]}' \
        --example-shape 1,200,80 \
        --ckpt embedding_model.ckpt \
        --out-dir converted/ --name embedding_model
"""

import argparse
import importlib
import json
from pathlib import Path


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--module", required=True,
                    help="dotted path to the flax module class")
    ap.add_argument("--kwargs", default="{}",
                    help="JSON constructor kwargs")
    ap.add_argument("--example-shape", required=True,
                    help="comma-separated example input shape, e.g. 1,200,80")
    ap.add_argument("--example-dtype", default="float32")
    ap.add_argument("--init-kwargs", default='{"train": false}',
                    help="JSON kwargs for module.init after the example")
    ap.add_argument("--ckpt", required=True, help="torch checkpoint path")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--name", required=True,
                    help="loadable name (files params_<name>.ckpt / "
                         "state_<name>.ckpt)")
    args = ap.parse_args()

    import os

    import jax

    # the axon TPU plugin ignores the JAX_PLATFORMS env var and hangs
    # at init when the TPU tunnel is unreachable — honor the env var
    # programmatically so CPU-only conversion never touches the tunnel
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import jax.numpy as jnp

    from speechbrain_tpu.utils.checkpoints import save_pytree
    from speechbrain_tpu.utils.torch_convert import (
        pour_reference_checkpoint,
    )

    mod_path, cls_name = args.module.rsplit(".", 1)
    cls = getattr(importlib.import_module(mod_path), cls_name)
    kwargs = {
        k: tuple(v) if isinstance(v, list) else v
        for k, v in json.loads(args.kwargs).items()
    }
    module = cls(**kwargs)
    shape = tuple(int(d) for d in args.example_shape.split(","))
    example = jnp.zeros(shape, getattr(jnp, args.example_dtype))
    init_kwargs = json.loads(args.init_kwargs)
    variables = dict(
        module.init(jax.random.PRNGKey(0), example, **init_kwargs)
    )
    poured = pour_reference_checkpoint(module, variables, args.ckpt)

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    save_pytree(poured["params"], out / f"params_{args.name}.ckpt")
    rest = {k: v for k, v in poured.items() if k != "params"}
    if rest:
        save_pytree(rest, out / f"state_{args.name}.ckpt")
    n = sum(
        x.size for x in jax.tree_util.tree_leaves(poured["params"])
    )
    print(f"converted {args.ckpt} -> {out} ({n / 1e6:.2f}M params, "
          f"state collections: {sorted(rest)})")


if __name__ == "__main__":
    main()
