"""ViG (gated linear attention) parity vs the reference vig.py.

The reference imports the ``fla`` Triton package (unavailable here); the test
stubs it with a naive-loop torch oracle implementing the documented GLA
recurrence (S_t = diag(exp(gk_t)) S_{t-1} + k_t^T v_t; o_t = q_t S_t * d_k^-.5),
so the reference file's own forward logic (projections, gating, RoPE, cls
splicing) runs unmodified and our flax model must reproduce it end to end.
"""

import sys
import types

import numpy as np
import pytest

from conftest import load_reference_module, nchw_to_nhwc, stub_common_modules

torch = pytest.importorskip("torch")


def _install_fla_stub():
    import torch.nn.functional as F
    from torch import nn

    def _gla_loop(q, k, v, g, scale=None):
        B, H, N, Dk = q.shape
        Dv = v.shape[-1]
        scale = Dk ** -0.5 if scale is None else scale
        S = torch.zeros(B, H, Dk, Dv, dtype=torch.float32)
        outs = []
        qf, kf, vf, gf = (t.float() for t in (q, k, v, g))
        for t in range(N):
            S = S * torch.exp(gf[:, :, t])[..., None] \
                + kf[:, :, t][..., None] * vf[:, :, t][..., None, :]
            outs.append(torch.einsum("bhk,bhkv->bhv", qf[:, :, t] * scale, S))
        return torch.stack(outs, dim=2).to(v.dtype), None

    class StubRMSNorm(nn.Module):
        def __init__(self, hidden_size=None, eps=1e-6, **kw):
            super().__init__()
            self.eps = eps
            self.weight = nn.Parameter(torch.ones(hidden_size))

        def forward(self, x, residual=None, prenorm=False):
            if residual is not None:
                x = x + residual
            xf = x.float()
            y = xf * torch.rsqrt(xf.pow(2).mean(-1, keepdim=True) + self.eps)
            y = (y * self.weight).to(x.dtype)
            return (y, x) if prenorm else y

    class GLAConfig:
        def __init__(self, **kw):
            defaults = dict(rms_norm_eps=1e-6, intermediate_size=None,
                            clamp_min=None, fuse_norm=True,
                            initializer_range=0.02)
            defaults.update(kw)
            for k, v in defaults.items():
                setattr(self, k, v)

    def swiglu_linear(gate, y, w, b):
        out = (F.silu(gate) * y) @ w.t()
        return out if b is None else out + b

    mods = {}
    fla = types.ModuleType("fla")
    fla_models = types.ModuleType("fla.models")
    fla_models.GLAConfig = GLAConfig
    fla_modules = types.ModuleType("fla.modules")
    fla_modules.RMSNorm = StubRMSNorm
    fla_modules.FusedRMSNormSwishGate = StubRMSNorm
    fla_act = types.ModuleType("fla.modules.activations")
    fla_act.swiglu = lambda g, y: F.silu(g) * y
    fla_act.swiglu_linear = swiglu_linear
    fla_rot = types.ModuleType("fla.modules.rotary")
    fla_rot.RotaryEmbedding = object
    fla_ops = types.ModuleType("fla.ops")
    fla_gla = types.ModuleType("fla.ops.gla")
    fla_gla.chunk_gla = _gla_loop
    fla_gla.fused_chunk_gla = _gla_loop
    fla_gla.fused_recurrent_gla = lambda q, k, v, g, s=None: _gla_loop(q, k, v, g)
    fla_cf = types.ModuleType("fla.ops.gla.chunk_fuse")
    fla_cf.FusedChunkGLAFunction = object
    fla_cf.pad = lambda x: x
    fla_rf = types.ModuleType("fla.ops.gla.recurrent_fuse")
    fla_rf.bid_fused_recurrent_gla = None
    ccd = types.ModuleType("causal_conv1d")
    ccdi = types.ModuleType("causal_conv1d.causal_conv1d_interface")
    ccdi.CausalConv1dFn = object
    ccd.causal_conv1d_interface = ccdi
    mods.update({
        "fla": fla, "fla.models": fla_models, "fla.modules": fla_modules,
        "fla.modules.activations": fla_act, "fla.modules.rotary": fla_rot,
        "fla.ops": fla_ops, "fla.ops.gla": fla_gla,
        "fla.ops.gla.chunk_fuse": fla_cf,
        "fla.ops.gla.recurrent_fuse": fla_rf,
        "causal_conv1d": ccd,
        "causal_conv1d.causal_conv1d_interface": ccdi,
    })
    for k, v in mods.items():
        sys.modules.setdefault(k, v)


def _install_timm_stub():
    import torch.nn as nn

    stub_common_modules()
    tv = types.ModuleType("timm.models.vision_transformer")

    class _Attention(nn.Module):
        def __init__(self, dim, num_heads=8, qkv_bias=False, attn_drop=0.0,
                     proj_drop=0.0):
            super().__init__()
            self.num_heads = num_heads
            self.scale = (dim // num_heads) ** -0.5
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.proj = nn.Linear(dim, dim)
            self.attn_drop = nn.Dropout(attn_drop)
            self.proj_drop = nn.Dropout(proj_drop)

    tv.VisionTransformer = object
    tv._cfg = lambda **k: k
    tv.Attention = _Attention
    tr = types.ModuleType("timm.models.registry")
    tr.register_model = lambda f: f
    # overwrite, don't setdefault: test_lsnet_parity installs its own
    # timm.models.vision_transformer stub (no Attention) in the same session
    sys.modules["timm.models.vision_transformer"] = tv
    sys.modules["timm.models.registry"] = tr
    import timm

    timm.models.vision_transformer = tv
    timm.models.registry = tr


@pytest.fixture(scope="module")
def ref_mod():
    _install_timm_stub()
    _install_fla_stub()
    return load_reference_module("vig.py", "ref_vig")


def _vig_key_map(key):
    key = key.replace("patch_embed.proj", "patch_embed_proj")
    return key


@pytest.mark.parametrize("rope_mode", ["none", "2dv1"])
def test_vig_forward_parity(ref_mod, rng, rope_mode):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.vig import ViG
    from image_restoration_tpu.utils.torch_import import import_state_dict

    torch.manual_seed(0)
    tnet = ref_mod.ViG(
        img_size=32, patch_size=16, stride=16, depth=2, num_heads=2,
        embed_dim=32, num_classes=10, classification_mode="mid_clstok",
        attn_model="fused_chunk", rope_mode=rope_mode, drop_path_rate=0.0,
        expand_k=0.5, expand_v=1, patch_embed_version="v2",
    ).train()  # the GLA bidirectional path is the train branch

    jnet = ViG(img_size=32, patch_size=16, depth=2, num_heads=2, embed_dim=32,
               num_classes=10, classification_mode="mid_clstok",
               rope_mode=rope_mode, patch_embed_version="v2")

    x = rng.random((2, 3, 32, 32), dtype=np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x)).numpy()

    xj = jnp.asarray(nchw_to_nhwc(x))
    params = jnet.init(jax.random.PRNGKey(0), xj)["params"]
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = import_state_dict(params, sd, key_map=_vig_key_map)
    got = np.asarray(jnet.apply({"params": params}, xj))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
