"""Object detection: CenterNet top-k decode on device.

    python examples/detect.py [model_name]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

import pytorchcv_tpu as ptc


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "centernet_resnet18_voc"
    model = ptc.get_model(name)
    h, w = model.in_size
    x = jnp.asarray(np.random.RandomState(0).rand(1, h, w, 3), jnp.float32)
    dets = model(x)               # (B, topk, 6): x1,y1,x2,y2,cls,score
    top = np.asarray(dets)[0, :3]
    print(f"{name}: input {x.shape} -> detections {dets.shape}")
    for d in top:
        print(f"  box ({d[0]:.0f},{d[1]:.0f})-({d[2]:.0f},{d[3]:.0f}) "
              f"class {int(d[4])} score {d[5]:.3f}")


if __name__ == "__main__":
    main()
