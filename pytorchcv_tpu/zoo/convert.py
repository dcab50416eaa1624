"""Generic torch state_dict -> NHWC flax variables converter.

Because every model's linen parameter tree mirrors its reference module tree
(same submodule names), conversion is a single mechanical rule set applied to
ALL 159 families — no per-family key maps:

  flax leaf            torch leaf                transform
  -------------------  ------------------------  ---------------------------
  params .../kernel    .weight  (O,I/g,kH,kW)    transpose (2,3,1,0) -> HWIO
  params .../kernel    .weight  (O,I/g,K)  1d    transpose (2,1,0)   -> WIO
  params .../kernel    .weight  (O,I)   dense    transpose (1,0)     -> IO
  params .../kernel    .weight  (I,O/g,kH,kW)    transpose (2,3,0,1) (deconv)
  params .../scale     .weight  (norm layers)    copy
  params .../bias      .bias                     copy
  params .../weight    .weight (PReLU, etc.)     copy
  batch_stats .../mean .running_mean             copy
  batch_stats .../var  .running_var              copy

torch ``num_batches_tracked`` buffers are ignored (as the reference's own
loader effectively does; model_store.py:331-334 filters by target keys).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from ..utils import flatten_tree

__all__ = ["convert_state_dict", "ConversionError"]


class ConversionError(RuntimeError):
    pass


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor
    return t.detach().cpu().numpy()


def _convert_leaf(flax_path: Tuple[str, ...], target_shape, collection: str,
                  torch_tensors: Dict[str, np.ndarray],
                  consumed: set) -> np.ndarray:
    *scope, leaf = flax_path
    prefix = ".".join(scope)

    def take(suffix: str) -> np.ndarray:
        key = f"{prefix}.{suffix}" if prefix else suffix
        if key not in torch_tensors:
            # Shared-submodule alias: torch registers a module shared across
            # sibling units under EVERY unit (e.g. DIA attention,
            # diaresnet.py:203-207: `stage.unit{K}.attention...` all alias
            # one tensor); our tree stores it once at the sharing parent.
            # Probe with "unit1." inserted at each scope depth.
            parts = prefix.split(".") if prefix else []
            for i in range(len(parts), -1, -1):
                cand = ".".join(parts[:i] + ["unit1"] + parts[i:])
                cand = f"{cand}.{suffix}"
                if cand in torch_tensors:
                    key = cand
                    break
            else:
                raise ConversionError(
                    f"missing torch key {key!r} for flax leaf "
                    f"{'/'.join(flax_path)} ({collection})")
        consumed.add(key)
        return _to_numpy(torch_tensors[key])

    if collection == "batch_stats":
        if leaf == "mean":
            return take("running_mean")
        if leaf == "var":
            return take("running_var")
        raise ConversionError(f"unknown batch_stats leaf {leaf!r}")

    if collection == "buffers":
        # non-trainable torch buffers stored under their own name
        # (e.g. CondenseNet's learned-group-conv ``index``; XDenseNet's
        # expander ``mask`` follows the conv-kernel OIHW->HWIO transpose).
        arr = take(leaf)
        if arr.ndim == 4 and arr.transpose(2, 3, 1, 0).shape == \
                tuple(target_shape):
            return arr.transpose(2, 3, 1, 0)
        return arr

    if leaf == "kernel":
        w = take("weight")
        if w.ndim == 4:
            # One rule for conv AND deconv: ConvTranspose2d stores (kH, kW,
            # O, I), which this same transpose produces from torch's
            # (I, O, kH, kW).
            cand = w.transpose(2, 3, 1, 0)
            if cand.shape == tuple(target_shape):
                return cand
            raise ConversionError(
                f"conv kernel shape mismatch at {'/'.join(flax_path)}: "
                f"torch {w.shape} vs flax {tuple(target_shape)}")
        if w.ndim == 3:
            cand = w.transpose(2, 1, 0)
            if cand.shape == tuple(target_shape):
                return cand
            cand = w.transpose(2, 0, 1)  # ConvTranspose1d layout
            if cand.shape == tuple(target_shape):
                return cand
            raise ConversionError(
                f"conv1d kernel shape mismatch at {'/'.join(flax_path)}")
        if w.ndim == 2:
            return w.transpose(1, 0)
        if w.ndim == 5:
            # Conv3d: (O, I, D, H, W) -> DHWIO
            cand = w.transpose(2, 3, 4, 1, 0)
            if cand.shape == tuple(target_shape):
                return cand
            if w.shape[-1] == 1 and w.shape[-2] == 1:
                # Conv3d used as a channel-axis 1D conv (ChannelNet's
                # channel-wise conv): (O, I, D, 1, 1) -> (D, I, O)
                cand = w[:, :, :, 0, 0].transpose(2, 1, 0)
                if cand.shape == tuple(target_shape):
                    return cand
        raise ConversionError(
            f"unsupported kernel rank {w.ndim} at {'/'.join(flax_path)}")
    if leaf == "scale":
        return take("weight")
    if leaf in ("bias", "weight"):
        return take(leaf)
    # Custom scalar/vector parameters keep their torch name verbatim
    # (e.g. DANet ScaleBlock ``alpha``, danet.py:22).
    return take(leaf)


def convert_state_dict(state_dict: Dict[str, Any], shape_variables,
                       strict: bool = True):
    """Convert a torch state_dict into flax variables matching
    ``shape_variables`` (a {'params':..., 'batch_stats':...} shape tree)."""
    torch_tensors = {k: v for k, v in state_dict.items()}
    consumed: set = set()
    out: Dict[str, Any] = {}
    for collection, tree in shape_variables.items():
        built: Dict[str, Any] = {}
        for path, leaf_shape in flatten_tree(tree):
            arr = _convert_leaf(path, leaf_shape.shape, collection,
                                torch_tensors, consumed)
            if tuple(arr.shape) != tuple(leaf_shape.shape):
                raise ConversionError(
                    f"shape mismatch at {collection}/{'/'.join(path)}: "
                    f"converted {arr.shape} vs expected {leaf_shape.shape}")
            node = built
            for key in path[:-1]:
                node = node.setdefault(key, {})
            node[path[-1]] = arr.astype(np.dtype(leaf_shape.dtype))
        out[collection] = built

    if strict:
        # Tensors aliased under several keys (torch shared submodules) count
        # as consumed once any alias is.
        def _tid(v):
            try:
                return v.data_ptr()
            except AttributeError:
                pass
            try:
                return v.__array_interface__["data"][0]
            except (AttributeError, KeyError):
                return id(v)

        consumed_ids = {_tid(torch_tensors[k]) for k in consumed}
        leftovers = [k for k, v in torch_tensors.items()
                     if k not in consumed
                     and _tid(v) not in consumed_ids
                     and not k.endswith("num_batches_tracked")
                     # static derived buffers recomputed at trace time
                     # (ProPainter attention's rolled-token indices)
                     and not k.endswith("valid_ind_rolled")]
        if leftovers:
            raise ConversionError(
                f"{len(leftovers)} torch keys unconsumed, e.g. "
                f"{leftovers[:5]}")
    return out
