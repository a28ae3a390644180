"""PyTorch checkpoint -> flax params importer.

The reference publishes weights as torch pickles in several flavors
(SURVEY.md §2.3 Checkpoint I/O): Lightning ``.ckpt`` (key ``state_dict`` with
a ``net.`` prefix), BasicSR ``.pth`` (keys ``params`` / ``params_ema``), raw
``state_dict`` files, and DDP dumps with a ``module.`` prefix
(DarkIR-main/testing.py:35-50, transweather_model.py:792-805).

Our flax modules are named after the torch attribute paths, so a mechanical
rule maps keys:

  torch ``encoder_level1.0.attn.qkv.weight``  (OIHW conv kernel)
  ->  flax ``encoder_level1_0 / attn / qkv / conv / kernel``  (HWIO)

Rules: digit segments merge into their parent with ``_`` (Sequential
indices); single-child wrapper modules (our ``Conv.conv``, ``LayerNorm.body``)
are descended implicitly; ``weight`` maps to ``kernel`` (transposed) for
convs/denses and stays ``weight`` for layernorms.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Mapping

import jax.numpy as jnp
import numpy as np


def _merge_digit_segments(segs):
    out = []
    for s in segs:
        if out and re.fullmatch(r"\d+", s):
            out[-1] = f"{out[-1]}_{s}"
        else:
            out.append(s)
    return out


def _convert_tensor(name: str, arr: np.ndarray, target_name: str, target_shape):
    if target_name == "kernel":
        if arr.ndim == 4:  # conv OIHW -> HWIO
            arr = arr.transpose(2, 3, 1, 0)
        elif arr.ndim == 2:  # dense (O, I) -> (I, O)
            arr = arr.T
    if tuple(arr.shape) != tuple(target_shape):
        # allow squeezable mismatches (e.g. (C,1,1) vs (C,))
        if np.prod(arr.shape) == np.prod(target_shape):
            arr = arr.reshape(target_shape)
        else:
            raise ValueError(
                f"shape mismatch for {name}: torch {arr.shape} vs flax {target_shape}"
            )
    return arr


def strip_prefixes(state_dict: Mapping[str, Any], prefixes=("module.", "net.", "model.")):
    """Strip a leading prefix shared by *all* keys (DDP/Lightning dumps)."""
    sd = dict(state_dict)
    changed = True
    while changed:
        changed = False
        for p in prefixes:
            if sd and all(k.startswith(p) for k in sd):
                sd = {k[len(p):]: v for k, v in sd.items()}
                changed = True
    return sd


def unwrap_checkpoint(obj: Any, prefer_ema: bool = False) -> Dict[str, Any]:
    """Pull the actual tensor dict out of the various checkpoint envelopes."""
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, Mapping):
        for key in (("params_ema", "params") if prefer_ema else ("params", "params_ema")):
            if key in obj and isinstance(obj[key], Mapping):
                return dict(obj[key])
        for key in ("state_dict", "model", "net", "model_state_dict"):
            if key in obj and isinstance(obj[key], Mapping) and all(
                hasattr(v, "shape") or isinstance(v, np.ndarray)
                for v in obj[key].values()
            ):
                return dict(obj[key])
        if all(hasattr(v, "shape") or np.isscalar(v) for v in obj.values()):
            return dict(obj)
    raise ValueError(f"unrecognized checkpoint structure: {type(obj)}")


def import_state_dict(
    flax_params: Dict[str, Any],
    state_dict: Mapping[str, Any],
    key_map: Callable[[str], str | None] | None = None,
    dtype=jnp.float32,
    strict: bool = True,
) -> Dict[str, Any]:
    """Fill a flax params tree from a torch state_dict.

    ``key_map`` optionally rewrites / drops (return None) torch keys first.
    Returns a new params tree; raises on unmapped keys when strict.
    """
    import copy

    params = copy.deepcopy(_to_mutable(flax_params))
    sd = strip_prefixes(state_dict)
    filled = set()
    missing = []

    for tkey, tval in sd.items():
        if key_map is not None:
            tkey2 = key_map(tkey)
            if tkey2 is None:
                continue
            tkey = tkey2
        arr = np.asarray(tval.detach().cpu().numpy() if hasattr(tval, "detach") else tval)
        segs = _merge_digit_segments(tkey.split("."))
        mods, leaf = segs[:-1], segs[-1]
        node = params
        path = []
        for s in mods:
            # descend flax-side single-child wrappers until s matches
            while (
                isinstance(node, dict)
                and s not in node
                and len(node) == 1
                and isinstance(next(iter(node.values())), dict)
            ):
                k = next(iter(node))
                node = node[k]
                path.append(k)
            if isinstance(node, dict) and s in node:
                node = node[s]
                path.append(s)
            # else: torch-side wrapper module with no flax counterpart
            # (e.g. OverlapPatchEmbed.proj) — skip the segment; the leaf
            # resolution below plus shape checks backstop mis-assignment.
        if not isinstance(node, dict):
            missing.append(tkey)
            continue
        # resolve the leaf, descending single-child wrappers
        target = None
        while target is None:
            candidates = [leaf] + (["kernel", "scale"] if leaf == "weight" else [])
            for c in candidates:
                if c in node and not isinstance(node[c], dict):
                    target = c
                    break
            if target is None:
                if len(node) == 1 and isinstance(next(iter(node.values())), dict):
                    k = next(iter(node))
                    node = node[k]
                    path.append(k)
                else:
                    break
        if target is None:
            missing.append(tkey)
            continue
        node[target] = jnp.asarray(
            _convert_tensor(tkey, arr, target, node[target].shape), dtype
        )
        filled.add(tuple(path + [target]))

    if strict and missing:
        raise KeyError(f"{len(missing)} torch keys had no flax home, e.g. {missing[:8]}")

    unfilled = [p for p in _leaf_paths(params) if p not in filled]
    if strict and unfilled:
        raise KeyError(f"{len(unfilled)} flax leaves unfilled, e.g. {unfilled[:8]}")
    return params


def _to_mutable(tree):
    if isinstance(tree, Mapping):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def _leaf_paths(tree, prefix=()):
    out = []
    for k, v in tree.items():
        if isinstance(v, dict):
            out.extend(_leaf_paths(v, prefix + (k,)))
        else:
            out.append(prefix + (k,))
    return out


def import_variables(
    variables: Dict[str, Any],
    state_dict: Mapping[str, Any],
    key_map: Callable[[str], str | None] | None = None,
    dtype=jnp.float32,
    strict: bool = True,
) -> Dict[str, Any]:
    """Like import_state_dict but fills a full flax variables dict:
    BatchNorm running stats go to 'batch_stats', the rest to 'params'
    (num_batches_tracked counters are dropped)."""
    sd = strip_prefixes(state_dict)
    if key_map is not None:
        sd = {key_map(k): v for k, v in sd.items() if key_map(k) is not None}
    stats = {k: v for k, v in sd.items() if k.endswith(("running_mean", "running_var"))}
    params_sd = {
        k: v for k, v in sd.items()
        if k not in stats and not k.endswith("num_batches_tracked")
    }
    out = {"params": import_state_dict(variables["params"], params_sd,
                                       dtype=dtype, strict=strict)}
    if "batch_stats" in variables:
        out["batch_stats"] = import_state_dict(variables["batch_stats"], stats,
                                               dtype=jnp.float32, strict=strict)
    return out


def load_torch_checkpoint(path: str, prefer_ema: bool = False) -> Dict[str, Any]:
    """torch.load a checkpoint file on CPU and unwrap to a flat tensor dict."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    return unwrap_checkpoint(obj, prefer_ema=prefer_ema)
