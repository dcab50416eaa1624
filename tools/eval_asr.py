"""ASR word-error-rate (WER) evaluation harness.

    python tools/eval_asr.py quartznet15x5_en waveforms.npy lengths.npy \
        transcripts.txt [--mode auto|int8|bf16]
    python tools/eval_asr.py quartznet15x5_en --wav file1.wav file2.wav \
        --ref transcripts.txt

Implements the reference's published ASR eval protocol
(reference README.md:806-809 rows: WER on LibriSpeech/MCV): waveforms
run through the ASR serving path (f32 mel front-end + bf16/int8 trunk),
logits greedy-CTC-decode (merge repeats, drop blanks — CtcDecoder,
reference jasper.py:302), and WER accumulates corpus-wide:

    WER = total word-level edit distance / total reference words

Waveform input is an (N, S) float32 array + (N,) lengths (or wav files
via --wav, read through AudioReader). Transcripts: one line per
utterance. ``--selftest`` proves the harness runnable end to end.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def edit_distance(ref, hyp) -> int:
    """Levenshtein distance between two token sequences."""
    m, n = len(ref), len(hyp)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ref[i - 1] != hyp[j - 1]))
        prev = cur
    return prev[n]


def wer(refs, hyps) -> dict:
    """Corpus WER: total word edit distance / total reference words."""
    assert len(refs) == len(hyps)
    dist = words = 0
    for r, h in zip(refs, hyps):
        rw, hw = r.split(), h.split()
        dist += edit_distance(rw, hw)
        words += len(rw)
    return {"wer": dist / max(words, 1), "n_words": words,
            "edit_distance": dist, "n_utts": len(refs)}


def evaluate(model_name: str, waveforms: np.ndarray, lengths: np.ndarray,
             transcripts, batch: int = 16, mode: str = "auto",
             pretrained: bool = True, serve=None, **model_kwargs):
    import jax.numpy as jnp
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.models.jasper import EN_VOCAB, CtcDecoder
    from pytorchcv_tpu.serve import make_asr_serving_fn

    if serve is None:
        serve = make_asr_serving_fn(model_name, mode=mode,
                                    pretrained=pretrained, **model_kwargs)
    vocab = getattr(ptc.get_model(model_name, init=False,
                                  **model_kwargs).module,
                    "vocabulary", None) or EN_VOCAB
    decoder = CtcDecoder(vocab)

    n = (len(waveforms) // batch) * batch
    hyps = []
    for i in range(0, n, batch):
        logits, out_len = serve(jnp.asarray(waveforms[i:i + batch]),
                                jnp.asarray(lengths[i:i + batch]))
        preds = np.asarray(jnp.argmax(logits.astype(jnp.float32), -1))
        out_len = np.asarray(out_len)
        for b in range(preds.shape[0]):
            hyps.append(decoder([preds[b, :out_len[b]]])[0])
    res = wer([t.strip().lower() for t in transcripts[:n]], hyps)
    res["hypotheses"] = hyps[:4]
    return res


def _selftest():
    """End-to-end smoke: transcripts taken from the model's own greedy
    decode must score WER = 0; the WER metric itself reproduces
    hand-computed values."""
    import jax.numpy as jnp
    from pytorchcv_tpu.serve import make_asr_serving_fn

    # metric unit checks
    assert wer(["a b c"], ["a b c"])["wer"] == 0.0
    assert wer(["a b c"], ["a x c"])["wer"] == 1 / 3
    assert wer(["a b c d"], ["b c"])["wer"] == 0.5        # 2 deletions
    assert wer(["a", "b b"], ["a x", "b"])["wer"] == 2 / 3

    rng = np.random.RandomState(0)
    waves = (0.1 * rng.randn(2, 16000)).astype(np.float32)
    lens = np.array([16000, 12800], np.int32)
    serve = make_asr_serving_fn("jasper5x3", mode="bf16", pretrained=False)
    res0 = evaluate("jasper5x3", waves, lens, ["placeholder"] * 2,
                    batch=2, mode="bf16", pretrained=False, serve=serve)
    hyps = res0["hypotheses"]
    res = evaluate("jasper5x3", waves, lens, hyps, batch=2, mode="bf16",
                   pretrained=False, serve=serve)
    print("selftest:", {k: v for k, v in res.items() if k != "hypotheses"})
    assert res["wer"] == 0.0, res
    print("OK")


if __name__ == "__main__":
    args = sys.argv[1:]
    if "--selftest" in args or len(args) < 2:
        _selftest()
    elif "--wav" in args:
        from pytorchcv_tpu.models.jasper import AudioReader, batch_waveforms
        i = args.index("--wav")
        j = args.index("--ref")
        paths = args[i + 1:j]
        refs = [ln for ln in open(args[j + 1]).read().splitlines() if ln]
        waves, lens = batch_waveforms(AudioReader().read_from_files(paths))
        print(evaluate(args[0], waves, lens, refs, batch=len(paths)))
    else:
        waves = np.load(args[1], mmap_mode="r")
        lens = np.load(args[2])
        refs = [ln for ln in open(args[3]).read().splitlines() if ln]
        mode = args[args.index("--mode") + 1] if "--mode" in args \
            else "auto"
        print(evaluate(args[0], waves, lens, refs, mode=mode))
