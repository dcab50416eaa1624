"""Utility helpers (param counting, tree tools)."""

from __future__ import annotations

from typing import Any, Dict, Iterator, Tuple

import jax
import numpy as np


def calc_net_weight_count(model_or_variables) -> int:
    """Trainable parameter count (analog of reference
    ``model_store.py:365``: counts ``requires_grad`` params only, so linen
    ``batch_stats`` are excluded)."""
    from ..model import Model

    if isinstance(model_or_variables, Model):
        return model_or_variables.num_params()
    params = model_or_variables.get("params", model_or_variables)
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(params))


def flatten_tree(tree, prefix: Tuple[str, ...] = ()) -> Iterator[Tuple[Tuple[str, ...], Any]]:
    """Yield (path, leaf) pairs with string paths, depth-first sorted."""
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k in sorted(tree.keys()):
            yield from flatten_tree(tree[k], prefix + (str(k),))
    else:
        yield prefix, tree
