"""Quick param-count checker: compare registered models against the
reference registry. Usage: python tools/check_models.py [name ...]
(no args = all registered models). CPU, eval_shape only — no FLOPs."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import pytorchcv_tpu as ptc  # noqa: E402
from pytorchcv_tpu.zoo import get_model_metainfo_dict  # noqa: E402


def main(names):
    meta = get_model_metainfo_dict()
    if not names:
        names = [n for n in ptc.registered_models() if n in meta]
    bad = 0
    for name in names:
        try:
            model = ptc.get_model(name, init=False)
            got = model.num_params()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            bad += 1
            continue
        want = meta.get(name, {}).get("params")
        status = "OK" if got == want else f"MISMATCH (want {want})"
        if got != want:
            bad += 1
        print(f"{name}: {got} {status}")
    print(f"--- {len(names) - bad}/{len(names)} OK")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
