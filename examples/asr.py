"""Speech recognition: QuartzNet on raw audio -> greedy CTC text.

    python examples/asr.py [model_name]

Feeds random audio (no dataset in this environment); with pretrained
weights the same pipeline emits transcripts.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

import pytorchcv_tpu as ptc
from pytorchcv_tpu.models.jasper import CtcDecoder


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "quartznet5x5_en_ls"
    model = ptc.get_model(name)
    sr = 16000
    audio = jnp.asarray(np.random.RandomState(0).randn(2, sr) * 0.1,
                        jnp.float32)
    lens = jnp.asarray([sr, sr // 2], jnp.int32)
    logits, out_lens = model(audio, lens)
    vocab = list(" abcdefghijklmnopqrstuvwxyz'")
    decoder = CtcDecoder(vocab)
    texts = decoder(np.asarray(jnp.argmax(logits, axis=-1)))
    print(f"{name}: audio {audio.shape} -> logits {logits.shape}, "
          f"lens {np.asarray(out_lens).tolist()}")
    print("greedy decode (random weights => noise):",
          [t[:40] for t in texts])


if __name__ == "__main__":
    main()
