"""LSNet backbone parity vs the reference torch code (SKA evaluated via the
torch-loop reference semantics; triton/timm stubbed)."""

import sys
import types

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, load_reference_module, nchw_to_nhwc

torch = pytest.importorskip("torch")


def _stub_lsnet_deps():
    import conftest

    conftest.stub_common_modules()
    # triton (never executed on CPU)
    if "triton" not in sys.modules:
        import importlib.machinery

        tr = types.ModuleType("triton")
        tl = types.ModuleType("triton.language")
        # transformers probes find_spec("triton"); spec-less stubs make it
        # raise ValueError in any later test that imports transformers
        tr.__spec__ = importlib.machinery.ModuleSpec("triton", None)
        tr.__version__ = "0.0"
        tl.__spec__ = importlib.machinery.ModuleSpec("triton.language", None)
        tr.jit = lambda f: f
        tl.constexpr = object
        for a in ("float16", "float32", "float64"):
            setattr(tl, a, a)
        tr.language = tl
        tr.cdiv = lambda a, b: -(-a // b)
        sys.modules["triton"] = tr
        sys.modules["triton.language"] = tl
    # timm extras used by lsnet.py
    tm = sys.modules["timm.models"]
    vt = types.ModuleType("timm.models.vision_transformer")
    vt.trunc_normal_ = lambda *a, **k: None
    reg = types.ModuleType("timm.models.registry")
    reg.register_model = lambda f: f
    helpers = types.ModuleType("timm.models.helpers")
    helpers.build_model_with_cfg = lambda cls, variant, pretrained, **kw: cls(
        **{k: v for k, v in kw.items() if k != "default_cfg"})
    data = types.ModuleType("timm.data")
    data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)

    class SqueezeExcite(torch.nn.Module):
        def __init__(self, ch, rd_ratio=0.25):
            super().__init__()
            rd = int(ch * rd_ratio)
            self.conv_reduce = torch.nn.Conv2d(ch, rd, 1, bias=True)
            self.act1 = torch.nn.ReLU()
            self.conv_expand = torch.nn.Conv2d(rd, ch, 1, bias=True)

        def forward(self, x):
            s = x.mean((2, 3), keepdim=True)
            s = self.conv_expand(self.act1(self.conv_reduce(s)))
            return x * torch.sigmoid(s)

    sys.modules["timm.models.layers"].SqueezeExcite = SqueezeExcite
    sys.modules["timm.models.vision_transformer"] = vt
    sys.modules["timm.models.registry"] = reg
    sys.modules["timm.models.helpers"] = helpers
    sys.modules["timm.data"] = data
    tm.vision_transformer = vt
    tm.registry = reg
    tm.helpers = helpers


def _ska_torch(x, w):
    """Reference SKA semantics, NCHW (see tests/test_ska.py)."""
    n, c, h, wd = x.shape
    wc, k2 = w.shape[1], w.shape[2]
    ks = int(k2**0.5)
    pad = (ks - 1) // 2
    o = torch.zeros_like(x)
    xp = torch.nn.functional.pad(x, (pad, pad, pad, pad))
    for kh in range(ks):
        for kw in range(ks):
            xs = xp[:, :, kh : kh + h, kw : kw + wd]
            wk = w[:, :, kh * ks + kw].repeat(1, c // wc, 1, 1)
            o += xs * wk
    return o


@pytest.fixture(scope="module")
def ref_mod():
    from conftest import purge_modules

    purge_modules("model")
    _stub_lsnet_deps()
    sys.path.insert(0, f"{REFERENCE_ROOT}/20251113_lsnet_xy")
    try:
        ska_mod = types.ModuleType("model")
        sys.modules.setdefault("model", ska_mod)
        ska = load_reference_module("20251113_lsnet_xy/model/ska.py", "model.ska")

        class SKA(torch.nn.Module):
            def forward(self, x, w):
                return _ska_torch(x, w)

        ska.SKA = SKA
        mod = load_reference_module("20251113_lsnet_xy/model/lsnet.py", "model.lsnet")
        return mod
    finally:
        sys.path.pop(0)


def test_lsnet_parity(ref_mod, rng):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.lsnet import LSNet, lsnet_key_map
    from image_restoration_tpu.utils.torch_import import import_variables

    torch.manual_seed(0)
    tnet = ref_mod.LSNet(img_size=64, patch_size=8, num_classes=10,
                         embed_dim=[16, 32, 48, 64], key_dim=[8, 8, 8, 8],
                         depth=[1, 2, 2, 2], num_heads=[2, 2, 2, 2]).eval()
    jnet = LSNet(img_size=64, patch_size=8, num_classes=10,
                 embed_dim=(16, 32, 48, 64), key_dim=(8, 8, 8, 8),
                 depth=(1, 2, 2, 2), num_heads=(2, 2, 2, 2))

    x = rng.random((2, 3, 64, 64), dtype=np.float32)
    with torch.no_grad():
        ref_out = tnet(torch.from_numpy(x)).numpy()

    xj = jnp.asarray(nchw_to_nhwc(x))
    variables = jnet.init(jax.random.PRNGKey(0), xj)
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    variables = import_variables(dict(variables), sd, key_map=lsnet_key_map)
    got = np.asarray(jnet.apply(variables, xj))
    np.testing.assert_allclose(got, ref_out, rtol=3e-4, atol=3e-4)
