"""Mixed-precision policy.

The reference mixes fp16 half-model training (SRConvNet-main/train.py:69-70),
AMP custom_fwd/bwd in the Triton SKA kernel (ska.py:118-143, fp32 accumulate),
and fp32-forced FFT branches (20260104_CG_IR/src/net/model.py:291-307).

On TPU the idiomatic policy is: fp32 master params, bfloat16 activations and
MXU inputs with fp32 accumulation, and fp32 "islands" for numerically
sensitive ops (LayerNorm statistics, FFTs, softmax logits, metrics).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32      # storage (master) dtype
    compute_dtype: jnp.dtype = jnp.bfloat16   # activations / MXU input dtype
    norm_dtype: jnp.dtype = jnp.float32       # LayerNorm / stats dtype
    fft_dtype: jnp.dtype = jnp.float32        # FFT island dtype
    output_dtype: jnp.dtype = jnp.float32     # model output dtype

    def cast_compute(self, x):
        return x.astype(self.compute_dtype)

    def cast_norm(self, x):
        return x.astype(self.norm_dtype)

    def cast_output(self, x):
        return x.astype(self.output_dtype)


# Production: bf16 compute.
DEFAULT_POLICY = Policy()

# Numerical-parity testing vs the fp32 PyTorch reference: everything fp32.
PARITY_POLICY = Policy(compute_dtype=jnp.float32)


def bf16_policy() -> Policy:
    return DEFAULT_POLICY


def fp32_policy() -> Policy:
    return PARITY_POLICY
