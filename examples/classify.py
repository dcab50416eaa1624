"""Classify images with a zoo model.

    python examples/classify.py [model_name]

Uses random pixels when no image tooling is available; with pretrained
weights cached (``~/.torch/models``) pass ``--pretrained``.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

import pytorchcv_tpu as ptc
from pytorchcv_tpu.kernels import classification_preprocess


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "resnet50"
    pretrained = "--pretrained" in sys.argv
    model = ptc.get_model(name, pretrained=pretrained)
    if pretrained:
        model = model.as_bfloat16()

    # uint8 frames (e.g. decoded JPEGs) -> model input in one fused step
    src = (256, 256)
    pre = classification_preprocess(name, src)
    raw = np.random.RandomState(0).randint(0, 256, (4, *src, 3), np.uint8)
    x = pre(jnp.asarray(raw))

    logits = model(x)
    top1 = jnp.argmax(logits, axis=-1)
    print(f"{name}: input {x.shape} {x.dtype} -> logits {logits.shape}; "
          f"top-1 classes {np.asarray(top1).tolist()}")


if __name__ == "__main__":
    main()
