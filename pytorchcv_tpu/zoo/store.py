"""Weight store: registry lookup, download, SHA1 verification, caching,
torch-checkpoint conversion (analog of reference ``common/model_store.py``).

The cache directory defaults to ``~/.torch/models`` so checkpoints already
fetched by the reference library are reused directly.
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import zipfile
from typing import Any, Dict, Optional

from .convert import convert_state_dict

__all__ = ["get_model_metainfo_dict", "get_model_metainfo", "get_model_file",
           "load_pretrained", "download_model_file"]

_METAINFO: Optional[Dict[str, Any]] = None
_REPO_URL = ("https://github.com/osmr/imgclsmob/releases/download/"
             "{release}/{file_name}")


def get_model_metainfo_dict() -> Dict[str, Any]:
    """Load (and memoize) the registry of released checkpoints
    (analog of reference model_store.py:67, but parsed once)."""
    global _METAINFO
    if _METAINFO is None:
        path = os.path.join(os.path.dirname(__file__), "metainfo.json")
        with open(path) as f:
            _METAINFO = json.load(f)
    return _METAINFO


def get_model_metainfo(model_name: str) -> Dict[str, Any]:
    meta = get_model_metainfo_dict()
    if model_name not in meta:
        raise ValueError(f"no metainfo for model {model_name!r}")
    return meta[model_name]


def _check_sha1(file_path: str, sha1_hash: str) -> bool:
    """SHA1 content check (reference model_store.py:285)."""
    sha1 = hashlib.sha1()
    with open(file_path, "rb") as f:
        while True:
            data = f.read(1048576)
            if not data:
                break
            sha1.update(data)
    return sha1.hexdigest() == sha1_hash


def get_model_file(model_name: str,
                   root: str = os.path.join("~", ".torch", "models")) -> str:
    """Resolve (download if needed) the released ``.pth`` for a model
    (reference model_store.py:140). File name scheme:
    ``{name}-{error}-{sha1[:8]}.pth`` inside a zip of the same stem."""
    meta = get_model_metainfo(model_name)
    if meta["sha1"] is None:
        raise ValueError(f"model {model_name!r} has no released weights")
    error, sha1, release = meta["error"], meta["sha1"], meta["release"]
    short_sha1 = sha1[:8]
    file_name = f"{model_name}-{error}-{short_sha1}.pth"
    root = os.path.expanduser(root)
    file_path = os.path.join(root, file_name)
    if os.path.exists(file_path) and _check_sha1(file_path, sha1):
        return file_path
    os.makedirs(root, exist_ok=True)
    if os.path.exists(file_path):
        logging.warning("Mismatch in the content of model file detected. "
                        "Downloading again.")
    return download_model_file(file_name, file_path, release, sha1)


def download_model_file(file_name: str, file_path: str, release: str,
                        sha1: str, retries: int = 5) -> str:
    """Download + unzip + verify (reference model_store.py:195-282)."""
    try:
        import requests
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "pretrained weights require the `requests` package (or "
            "pre-populate the cache directory with the .pth file)") from e
    zip_file_path = file_path + ".zip"
    url = _REPO_URL.format(release=release, file_name=file_name + ".zip")
    last_err = None
    for attempt in range(retries):
        try:
            r = requests.get(url, stream=True, timeout=60)
            if r.status_code != 200:
                raise RuntimeError(f"HTTP {r.status_code} for {url}")
            with open(zip_file_path, "wb") as f:
                for chunk in r.iter_content(chunk_size=1048576):
                    f.write(chunk)
            with zipfile.ZipFile(zip_file_path) as zf:
                names = zf.namelist()
                zf.extractall(os.path.dirname(file_path))
            os.remove(zip_file_path)
            if not os.path.exists(file_path) and len(names) == 1:
                # tolerate release zips whose inner name differs from
                # the canonical {name}-{error}-{sha1[:8]}.pth
                os.replace(os.path.join(os.path.dirname(file_path),
                                        names[0]), file_path)
            if not _check_sha1(file_path, sha1):
                raise RuntimeError(f"SHA1 mismatch for {file_path}")
            return file_path
        except Exception as e:  # noqa: BLE001
            last_err = e
            logging.warning("download attempt %d/%d failed: %s",
                            attempt + 1, retries, e)
    raise RuntimeError(
        f"failed to download {url} after {retries} attempts: {last_err}")


def load_torch_checkpoint(file_path: str) -> Dict[str, Any]:
    """Read a torch-serialized state_dict as numpy arrays."""
    import torch
    state = torch.load(file_path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    return {k: v.numpy() for k, v in state.items()}


def load_pretrained(model, file_path: Optional[str] = None,
                    root: str = os.path.join("~", ".torch", "models")):
    """Fill ``model.variables`` from the released reference checkpoint."""
    import dataclasses
    import jax.numpy as jnp

    if file_path is None:
        file_path = get_model_file(model.name, root=root)
    state_dict = load_torch_checkpoint(file_path)
    shapes = model.shape_variables()
    variables = convert_state_dict(state_dict, shapes)
    variables = {c: _as_jnp(t) for c, t in variables.items()}
    return dataclasses.replace(model, variables=variables)


def _as_jnp(tree):
    import jax.numpy as jnp
    if isinstance(tree, dict):
        return {k: _as_jnp(v) for k, v in tree.items()}
    return jnp.asarray(tree)
