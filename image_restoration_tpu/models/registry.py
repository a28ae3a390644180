"""Model registry: name -> constructor, mirroring the reference's per-repo
model zoo behind one factory (the zoo's `--model` subparser dispatch,
MoCE-IR-main/src/options.py:86-94)."""

from __future__ import annotations

import warnings
from typing import Any, Callable, Dict

MODELS: Dict[str, Callable[..., Any]] = {}

_MODEL_MODULES = (
    "restormer", "adair", "moce_ir", "transweather", "srconvnet",
    "darkir", "nerd_rain", "drsformer", "sfhformer", "hogformer",
    "cg_ir", "igmoce_ir", "measnet", "mwformer", "lsnet",
    "lumisense_moe", "adaptir_ipt", "adaptir_edt", "vig", "moce_ir_patch",
    "demo_models", "rectiformer", "fpn_restormer", "mymodel", "vig_h",
    "lsnet_dense",
)


def register_model(name: str):
    def deco(ctor):
        MODELS[name.lower()] = ctor
        return ctor

    return deco


def get_model(name: str, **kwargs):
    key = name.lower()
    if key not in MODELS:
        # import model modules lazily so the registry is populated; a broken
        # module must NOT silently vanish from the registry — warn loudly and
        # re-raise with context if it was the one requested.
        from image_restoration_tpu import models as _m  # noqa: F401

        for mod in _MODEL_MODULES:
            try:
                __import__(f"image_restoration_tpu.models.{mod}")
            except Exception as e:  # ImportError or a module-level bug
                warnings.warn(
                    f"model module {mod!r} failed to import and is missing "
                    f"from the registry: {type(e).__name__}: {e}")
                if key not in MODELS and mod == key:
                    raise ImportError(
                        f"model {name!r} exists but its module failed to "
                        f"import") from e
    if key not in MODELS:
        raise KeyError(f"unknown model {name!r}; have {sorted(MODELS)}")
    return MODELS[key](**kwargs)
