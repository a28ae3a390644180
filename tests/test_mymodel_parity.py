"""MyModel parity vs the reference MyModel/model.py.

The reference's ``Mix`` is dimensionally inconsistent and cannot run
(model.py:794-799 build full-``dim`` norm/attention for a half-channel
branch — verified RuntimeError). The test patches the torch Mix with the
same minimal fix the build uses (attention at dim//2 + a 1x1 ``proj_attn``)
and then requires end-to-end parity, which exercises everything else
(Illu_Fre, GatedDegradationAdaption, the AdaptIR variant, Holistic LN, the
MoE decoder with zero-init scales) unmodified.
"""

import numpy as np
import pytest

from conftest import load_reference_module, nchw_to_nhwc, stub_common_modules

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_mod():
    stub_common_modules()
    mod = load_reference_module("MyModel/model.py", "ref_mymodel")

    import torch.nn as nn

    class FixedMix(nn.Module):
        def __init__(self, dim, num_heads, initial_temperature, LayerNorm_type,
                     bias):
            super().__init__()
            self.dim = dim
            self.norm_attn = mod.LayerNorm(dim // 2, LayerNorm_type)
            self.norm_local = mod.LayerNorm(dim // 2, LayerNorm_type)
            self.norm_illum = mod.LayerNorm(dim // 2, LayerNorm_type)
            self.attention = mod.Attention(dim // 2, num_heads, bias)
            self.local = mod.GatedDegradationAdaption(
                dim // 2, initial_temperature=initial_temperature)
            self.illumination = mod.Illu_Fre(dim // 2, bias)
            self.proj_attn = nn.Conv2d(dim // 2, dim, kernel_size=1)
            self.proj_local = nn.Conv2d(dim // 2, dim, kernel_size=1)
            self.proj_illum = nn.Conv2d(dim // 2, dim, kernel_size=1)
            self.ca = nn.Sequential(
                nn.AdaptiveAvgPool2d(1),
                nn.Conv2d(dim, dim // 2, kernel_size=1),
                nn.ReLU(inplace=True),
                nn.Conv2d(dim // 2, dim, kernel_size=1),
                nn.Sigmoid())
            self.final_proj = nn.Conv2d(dim * 3, dim, kernel_size=1)
            self.residual_proj = nn.Conv2d(dim, dim, kernel_size=1)
            self.gelu = nn.GELU()

        def forward(self, x):
            x_attn = x[:, 1::2]
            x_local = x[:, 0::2]
            a = self.proj_attn(self.attention(self.norm_attn(x_attn)))
            lo = self.proj_local(self.local(self.norm_local(x_local)))
            il = self.proj_illum(self.illumination(self.norm_illum(x_local)))
            fused = self.gelu(self.final_proj(torch.cat([a, lo, il], dim=1)))
            return self.ca(fused) * fused + self.residual_proj(x)

    mod.Mix = FixedMix
    return mod


def _key_map(key):
    if key.endswith("routing.complexity"):
        return None
    if ".mlp." in key and not key.startswith("freq_embed"):
        return None  # EncoderBlock.Mlp: constructed, never called
    key = key.replace(".layers.", ".")
    key = key.replace(".amp_fuse.weight", ".amp_fuse_weight")
    key = key.replace(".amp_fuse.bias", ".amp_fuse_bias")
    key = key.replace(".pha_fuse.weight", ".pha_fuse_weight")
    key = key.replace(".pha_fuse.bias", ".pha_fuse_bias")
    key = key.replace(".channel_interaction.1.", ".channel_interaction_1.")
    key = key.replace(".channel_interaction.3.", ".channel_interaction_3.")
    key = key.replace(".proj.0.", ".proj_0.")
    key = key.replace(".proj.2.", ".proj_2.")
    return key


@pytest.mark.parametrize("ln_type", ["WithBias", "HolisticWithBias"])
def test_mymodel_parity(ref_mod, rng, ln_type):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.mymodel import MyModel
    from image_restoration_tpu.utils.torch_import import import_variables

    torch.manual_seed(0)
    tnet = ref_mod.MyModel(
        dim=16, levels=3, heads=[1, 2, 4], num_blocks=[1, 1, 1],
        num_dec_blocks=[1, 1], ffn_expansion_factor=2,
        LayerNorm_type=ln_type, stage_depth=[1, 1], topk=1,
        rank=2, num_experts=4,
    ).eval()
    jnet = MyModel(dim=16, levels=3, heads=(1, 2, 4), num_blocks=(1, 1, 1),
                   num_dec_blocks=(1, 1), ffn_expansion_factor=2.0,
                   ln_type=ln_type, stage_depth=(1, 1), topk=1,
                   rank=2, num_experts=4)

    x = rng.random((1, 3, 32, 32), dtype=np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x)).numpy()
    xj = jnp.asarray(nchw_to_nhwc(x))
    variables = jnet.init(jax.random.PRNGKey(0), xj)
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    variables = import_variables(dict(variables), sd, key_map=_key_map)
    got = jnet.apply(variables, xj)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               ref, rtol=5e-4, atol=5e-4)
