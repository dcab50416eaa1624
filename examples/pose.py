"""Human pose estimation: SimplePose heatmaps -> keypoints.

    python examples/pose.py [model_name]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

import pytorchcv_tpu as ptc


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "simplepose_resnet18_coco"
    model = ptc.get_model(name)
    h, w = model.in_size
    x = jnp.asarray(np.random.RandomState(0).rand(2, h, w, 3), jnp.float32)
    keypoints = model(x)           # (B, 17, 3) = (x, y, score), vectorized
    print(f"{name}: input {x.shape} -> keypoints {keypoints.shape}")
    print("first person:", np.asarray(keypoints)[0, :3].round(2).tolist())


if __name__ == "__main__":
    main()
