"""Speech recognition: QuartzNet on raw audio -> greedy CTC text.

    python examples/asr.py [model_name]
    python examples/asr.py [model_name] --wav a.wav b.wav   # from files

Feeds random audio when no files are given (no dataset in this
environment); with pretrained weights the same pipeline emits
transcripts. ``--wav`` routes through the file-ingestion stage
(``make_asr_serving_fn(from_files=True)``: AudioReader -> padded
static-shape batch -> jitted waveform path).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

import pytorchcv_tpu as ptc
from pytorchcv_tpu.models.jasper import CtcDecoder


def main():
    args = sys.argv[1:]
    name = args[0] if args and not args[0].startswith("--") \
        else "quartznet5x5_en_ls"
    if "--wav" in args:
        from pytorchcv_tpu.serve import make_asr_serving_fn
        paths = args[args.index("--wav") + 1:]
        serve = make_asr_serving_fn(name, from_files=True)
        logits, out_lens = serve(paths)
    else:
        model = ptc.get_model(name)
        sr = 16000
        audio = jnp.asarray(np.random.RandomState(0).randn(2, sr) * 0.1,
                            jnp.float32)
        lens = jnp.asarray([sr, sr // 2], jnp.int32)
        logits, out_lens = model(audio, lens)
    vocab = list(" abcdefghijklmnopqrstuvwxyz'")
    decoder = CtcDecoder(vocab)
    texts = decoder(np.asarray(jnp.argmax(logits, axis=-1)))
    print(f"{name}: logits {logits.shape}, "
          f"lens {np.asarray(out_lens).tolist()}")
    print("greedy decode (random weights => noise):",
          [t[:40] for t in texts])


if __name__ == "__main__":
    main()
