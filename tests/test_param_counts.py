"""Registry-integrity tier (analog of reference
``tests/test_model_weight_counts.py``): every implemented model's parameter
count must equal the reference registry's ``net_weights`` value.

Counting goes through ``jax.eval_shape`` — no FLOPs — so the whole registered
zoo is checked on every run.
"""

import itertools
import os
import re

import pytest

import pytorchcv_tpu as ptc
from pytorchcv_tpu.zoo import get_model_metainfo_dict


def _family(name: str) -> str:
    """Crude family key: strip digits/size suffixes so each architecture
    family contributes representatives."""
    return re.sub(r"[0-9]+.*$", "", name)


def _cases():
    meta = get_model_metainfo_dict()
    names = [name for name in ptc.registered_models() if name in meta]
    if os.environ.get("PARAM_FULL"):
        return names
    # Default: first + last variant per family (keeps CI fast; run with
    # PARAM_FULL=1 for the exhaustive sweep).
    picked = []
    for _, group in itertools.groupby(sorted(names), key=_family):
        group = list(group)
        picked.append(group[0])
        if len(group) > 1:
            picked.append(group[-1])
    return picked


@pytest.mark.parametrize("name", _cases())
def test_param_count_matches_registry(name):
    meta = get_model_metainfo_dict()[name]
    model = ptc.get_model(name, init=False)
    assert model.num_params() == meta["params"], (
        f"{name}: got {model.num_params()}, registry says {meta['params']}")


@pytest.mark.parametrize("name", _cases())
def test_output_shape(name):
    meta = get_model_metainfo_dict()[name]
    model = ptc.get_model(name, init=False)
    out = model.eval_output_shape(batch=2)
    if isinstance(out, (tuple, list)):
        out = out[0]  # aux-output models: main head first
    if meta["dataset"] in ("in1k",):
        assert out.shape == (2, 1000)
    elif meta["dataset"] in ("cub",):
        assert out.shape == (2, 200)
    elif meta["dataset"] in ("cf",):  # cifar-10/svhn pool; classes vary
        assert out.shape[0] == 2
