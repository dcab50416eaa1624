"""Semantic segmentation: fused preprocessing + PSPNet forward.

    python examples/segment.py [model_name]

Default model runs at a reduced size so the example is quick on CPU;
real protocol sizes (480x480 VOC, 2048x1024 Cityscapes) work the same
way on a TPU chip.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

import pytorchcv_tpu as ptc
from pytorchcv_tpu.kernels.preprocess import segmentation_preprocess


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "fastscnn_cityscapes"
    size = (256, 512) if "cityscapes" in name else (240, 240)
    model = ptc.get_model(name, in_size=size).as_bfloat16()
    pre = segmentation_preprocess(size, (300, 600))
    raw = np.random.RandomState(0).randint(0, 256, (2, 300, 600, 3),
                                           np.uint8)
    x = pre(jnp.asarray(raw))
    out = model(x)
    if isinstance(out, tuple):
        out = out[0]
    classes = jnp.argmax(out, axis=-1)
    print(f"{name}: {raw.shape} uint8 -> mask {classes.shape} "
          f"({int(classes.max())} max class id)")


if __name__ == "__main__":
    main()
