"""IPT+AdaptIR forward parity vs the reference torch implementation.

The torch IPT body is fixed to 48x48 inputs (256 tokens of dim 576, learned
positional encoding); the parity test runs forward_train on one 48x48 crop
per task scale.
"""

import sys
import types

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, load_reference_module, nchw_to_nhwc

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_mod():
    # ipt.py imports torchvision.ops and matplotlib only at module level
    if "matplotlib" not in sys.modules:
        import importlib.machinery

        mpl = types.ModuleType("matplotlib")
        mpl.__spec__ = importlib.machinery.ModuleSpec("matplotlib", None)
        mpl.pyplot = types.ModuleType("matplotlib.pyplot")
        mpl.pyplot.__spec__ = importlib.machinery.ModuleSpec(
            "matplotlib.pyplot", None)
        sys.modules["matplotlib"] = mpl
        sys.modules["matplotlib.pyplot"] = mpl.pyplot
    from conftest import stub_torchvision

    stub_torchvision()
    sys.path.insert(0, f"{REFERENCE_ROOT}/AdaptIR-main/net")
    try:
        return load_reference_module("AdaptIR-main/net/ipt.py", "ref_ipt")
    finally:
        sys.path.pop(0)


class _Args:
    de_type = "sr_2"


def _filter_task(sd, task_idx):
    """Keep only the shared body + the tested task's head/tail."""
    out = {}
    for k, v in sd.items():
        if k.startswith(("head.", "tail.")):
            if not k.startswith((f"head.{task_idx}.", f"tail.{task_idx}.")):
                continue
        out[k] = v.detach().numpy()
    return out


@pytest.mark.parametrize("de_type,task_idx", [("sr_2", 0), ("denoise_30", 4)])
def test_ipt_forward_parity(ref_mod, rng, de_type, task_idx):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.adaptir_ipt import IPT, ipt_key_map
    from image_restoration_tpu.utils.torch_import import import_variables

    torch.manual_seed(0)
    args = _Args()
    args.de_type = de_type
    tnet = ref_mod.IPT(args).train()  # forward_train path; BN frozen manually
    tnet.eval()

    jnet = IPT()
    x = rng.random((1, 3, 48, 48), dtype=np.float32)
    with torch.no_grad():
        ref = (tnet.forward_train(torch.from_numpy(x) * 255.0) / 255.0).numpy()

    xj = jnp.asarray(nchw_to_nhwc(x))
    variables = jnet.init(jax.random.PRNGKey(0), xj, task_idx=task_idx)
    sd = _filter_task(tnet.state_dict(), task_idx)
    variables = import_variables(dict(variables), sd, key_map=ipt_key_map)
    got = jnet.apply(variables, xj, task_idx=task_idx)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
