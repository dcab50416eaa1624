"""Regenerate the reference README's Params / FLOPs/2 columns from our zoo.

Usage: python tools/gen_flops_table.py [name ...]
Defaults to the BASELINE.md representative set. Prints a markdown table
with our parameter counts and XLA-derived FLOPs/2 (MACs) next to the
reference's published numbers (pytorchcv_tpu/zoo/metainfo.json).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

DEFAULT = [
    "alexnet", "resnet18", "resnet50", "mobilenet_w1", "mobilenetv2_w1",
    "mobilenetv3_large_w1", "shufflenetv2_w1", "seresnet50", "densenet121",
    "efficientnet_b0", "mixnet_s", "regnetx002", "resnet20_cifar10",
    "wrn28_10_cifar10",
]


def main(names):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.utils.flops import flops2
    from pytorchcv_tpu.zoo.store import get_model_metainfo

    print("| Model | Params (ours) | Params (ref) | FLOPs/2 (ours) | "
          "FLOPs/2 note |")
    print("|---|---|---|---|---|")
    for name in names:
        model = ptc.get_model(name, init=False)
        params = model.num_params()
        try:
            info = get_model_metainfo(name)
            ref_params = info.get("params")
        except KeyError:
            ref_params = None
        mf = flops2(model) / 1e6
        ok = "=" if ref_params == params else "MISMATCH"
        print(f"| {name} | {params:,} | {ref_params:,} ({ok}) | "
              f"{mf:,.2f}M | xla cost_analysis |"
              if ref_params else
              f"| {name} | {params:,} | n/a | {mf:,.2f}M | xla |")


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT)
