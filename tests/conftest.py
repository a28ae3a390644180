"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

This is the TPU-build analog of the reference's world_size=1 mp.spawn
multi-GPU-without-a-cluster testing (DarkIR-main/testing.py:81-82): the same
pjit/shard_map code paths run on 8 virtual CPU devices here and on a real
v5e-8 unchanged.
"""

import os

# IR_TPU_TESTS=1 opts a session out of CPU-pinning so `-m tpu` kernel tests
# can run on the real chip (tests/test_tpu_kernels.py); everything else
# always runs on the virtual 8-device CPU mesh.
ON_TPU_SESSION = os.environ.get("IR_TPU_TESTS") == "1"

if not ON_TPU_SESSION:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

if not ON_TPU_SESSION:
    # The image ships a site config that pins jax_platforms="axon,cpu" (the
    # real TPU tunnel), overriding the env var — force pure-CPU for the mesh.
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def load_reference_module(relpath: str, name: str | None = None):
    """Import a reference .py file for numerical parity testing.

    We never copy reference code into the repo; tests import it at runtime
    to generate ground-truth activations from randomly initialized weights.
    """
    import importlib.util
    import sys

    path = os.path.join(REFERENCE_ROOT, relpath)
    if not os.path.exists(path):
        pytest.skip(f"reference file {relpath} unavailable")
    modname = name or ("ref_" + relpath.replace("/", "_").replace(".py", "").replace("-", "_"))
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


def stub_common_modules():
    """Stub heavy/unavailable deps (fvcore, timm, ptflops) the reference
    files import at module level only for FLOPs prints."""
    import sys
    import types

    import torch

    if "fvcore" not in sys.modules:
        fv = types.ModuleType("fvcore")
        fvnn = types.ModuleType("fvcore.nn")
        fvnn.FlopCountAnalysis = object
        fvnn.flop_count_table = lambda *a, **k: ""
        fvnn.flop_count_str = lambda *a, **k: ""
        fvnn.flop_count = lambda *a, **k: ({}, {})
        fvnn.parameter_count = lambda *a, **k: {}
        fv.nn = fvnn
        sys.modules["fvcore"] = fv
        sys.modules["fvcore.nn"] = fvnn
    if "ptflops" not in sys.modules:
        pt = types.ModuleType("ptflops")
        pt.get_model_complexity_info = lambda *a, **k: ("0", "0")
        sys.modules["ptflops"] = pt
    if "timm" in sys.modules and getattr(sys.modules["timm"], "__spec__", None) is None:
        # repair a spec-less stub some other test installed: transformers'
        # find_spec probe raises ValueError on spec-less modules
        import importlib.machinery

        sys.modules["timm"].__spec__ = importlib.machinery.ModuleSpec("timm", None)
    if "timm" not in sys.modules:
        import importlib.machinery

        timm = types.ModuleType("timm")
        # transformers probes importlib.util.find_spec("timm"), which
        # explodes on spec-less stub modules — give it a real-looking spec
        timm.__spec__ = importlib.machinery.ModuleSpec("timm", None)
        tm = types.ModuleType("timm.models")
        tl = types.ModuleType("timm.models.layers")
        tl.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
        tl.trunc_normal_ = lambda *a, **k: None

        class DropPath(torch.nn.Module):
            def __init__(self, p=0.0):
                super().__init__()
                self.drop_prob = p

            def forward(self, x):
                return x

        tl.DropPath = DropPath
        tm.layers = tl
        timm.models = tm
        sys.modules.update({"timm": timm, "timm.models": tm,
                            "timm.models.layers": tl})


def stub_torchvision():
    """Spec-equipped torchvision stub (transformers probes find_spec on it;
    a spec-less stub makes that raise)."""
    import importlib.machinery
    import sys
    import types

    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
    for sub in ("models", "ops", "utils"):
        m = types.ModuleType(f"torchvision.{sub}")
        m.__spec__ = importlib.machinery.ModuleSpec(f"torchvision.{sub}", None)
        setattr(tv, sub, m)
        sys.modules[f"torchvision.{sub}"] = m
    tv.models.VisionTransformer = object
    tv.utils.make_grid = lambda *a, **k: None
    sys.modules["torchvision"] = tv


def purge_modules(*prefixes):
    """Drop cached modules whose name matches a prefix — reference sub-repos
    reuse generic package names ('model', 'common') that collide across
    tests when both are loaded in one session."""
    import sys

    for name in list(sys.modules):
        if any(name == p or name.startswith(p + ".") for p in prefixes):
            del sys.modules[name]


# Files whose aggregate runtime dominates the suite (measured r2: >60s each,
# ~80% of the 40-60 min total). The fast tier `pytest -m "not slow"` runs
# the remaining ~4-5 min and still covers every subsystem + small parity.
SLOW_FILES = {
    "test_cli_end2end.py", "test_fused_ops.py", "test_hogformer_parity.py",
    "test_recipes.py", "test_measnet_parity.py", "test_mwformer_parity.py",
    "test_adaptir_edt_parity.py", "test_adair_parity.py",
    "test_adaptir_ipt_parity.py", "test_cg_ir_parity.py", "test_losses.py",
    "test_igmoce_parity.py", "test_moce_patch.py", "test_halo.py",
    "test_fpn_restormer_parity.py", "test_mymodel_parity.py",
    "test_moce_fast_paths.py", "test_drsformer_parity.py",
    "test_demo_models_parity.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.fspath.basename in SLOW_FILES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))
