"""Locate DRSformer MSFN's 41.5 ms/block (c=96 @ 512^2, bf16).

Variants (same shapes/op mix, selectively neutered) isolate the cost:
  full        : MSFN as shipped
  contig      : even/odd interleaves replaced by CONTIGUOUS half slices
                (wrong math, same tap work) — isolates the lane-strided
                a[..., 0::2] gathers
  no_stage2   : stage-2 pair convs skipped (x1 = x13, x2 = x23)
  dw3_only    : the 5x5 first-stage dwconv replaced by 3x3 (isolates 25-tap
                VPU cost)
  gdfn_like   : project_in -> one dw3 -> gelu gate -> project_out (what the
                canvas-kernel GDFN costs at the same width, for reference)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import flax.linen as nn
import jax
import jax.numpy as jnp

from chain_bench import marginal_adaptive
from image_restoration_tpu.models.drsformer import MSFN
from image_restoration_tpu.ops.common import Conv, ConvParams, _dwconv_taps


class MSFNVariant(nn.Module):
    dim: int
    variant: str = "full"
    expansion: float = 2.66
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.expansion)
        kw = dict(dtype=self.dtype)
        x = Conv(hidden * 2, 1, use_bias=False, name="project_in", **kw)(x)
        k5 = 3 if self.variant == "dw3_only" else 5
        d3 = nn.relu(Conv(hidden * 2, 3, padding=1, groups=hidden * 2,
                          use_bias=False, name="dwconv3x3", **kw)(x))
        d5 = nn.relu(Conv(hidden * 2, k5, padding=k5 // 2, groups=hidden * 2,
                          use_bias=False, name="dwconv5x5", **kw)(x))
        x13, x23 = jnp.split(d3, 2, axis=-1)
        x15, x25 = jnp.split(d5, 2, axis=-1)
        if self.variant == "no_stage2":
            x1, x2 = x13, x23
        else:
            x1 = nn.relu(self._g2(x13, x15, hidden, 3, "s1"))
            x2 = nn.relu(self._g2(x23, x25, hidden, k5, "s2"))
        kp, _ = ConvParams(self.dim, hidden * 2, 1, False,
                           name="project_out")()
        out = (jnp.einsum("bhwc,cd->bhwd", x1, kp[0, 0, :hidden].astype(x1.dtype),
                          preferred_element_type=jnp.float32)
               + jnp.einsum("bhwc,cd->bhwd", x2, kp[0, 0, hidden:].astype(x2.dtype),
                            preferred_element_type=jnp.float32))
        return out.astype(x.dtype)

    def _g2(self, a, b, groups, k, name):
        kern, _ = ConvParams(groups, 2, k, False, name=name)()
        h = a.shape[-1]
        if self.variant == "contig":
            ha = h // 2 + (h % 2)
            even = jnp.concatenate([a[..., :ha], b[..., :h - ha]], axis=-1)
            odd = jnp.concatenate([a[..., ha:], b[..., h - ha:]], axis=-1)
        elif h % 2 == 0:
            even = jnp.concatenate([a[..., 0::2], b[..., 0::2]], axis=-1)
            odd = jnp.concatenate([a[..., 1::2], b[..., 1::2]], axis=-1)
        else:
            even = jnp.concatenate([a[..., 0::2], b[..., 1::2]], axis=-1)
            odd = jnp.concatenate([a[..., 1::2], b[..., 0::2]], axis=-1)
        kern = kern.astype(a.dtype)
        return (_dwconv_taps(even, kern[:, :, 0:1, :], k // 2)
                + _dwconv_taps(odd, kern[:, :, 1:2, :], k // 2))


class GDFNLike(nn.Module):
    dim: int
    expansion: float = 2.66
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.expansion)
        kw = dict(dtype=self.dtype)
        x = Conv(hidden * 2, 1, use_bias=False, name="pi", **kw)(x)
        x = Conv(hidden * 2, 3, padding=1, groups=hidden * 2, use_bias=False,
                 name="dw", **kw)(x)
        a, b = jnp.split(x, 2, axis=-1)
        return Conv(self.dim, 1, use_bias=False, name="po", **kw)(
            nn.gelu(a) * b)


def time_mod(name, mod, x):
    p = mod.init(jax.random.PRNGKey(0), x)
    fn = lambda z: mod.apply(p, z).astype(z.dtype)
    ms = marginal_adaptive(fn, x, target_s=0.25, max_apps=24, reps=3) * 1e3
    print(f"  {name:12s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    c = 96
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 512, 512, c),
                          jnp.bfloat16) * 0.1
    print(f"MSFN variants at 1x512x512x{c} (bf16)")
    time_mod("full", MSFN(c, dtype=jnp.bfloat16), x)
    for v in ("full", "contig", "no_stage2", "dw3_only"):
        time_mod(v, MSFNVariant(c, variant=v), x)
    time_mod("gdfn_like", GDFNLike(c), x)


if __name__ == "__main__":
    main()
