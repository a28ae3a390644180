"""_small_group_conv decomposition must equal the grouped conv exactly
(the TPU fast path for small-group convs like DarkIR DBlock extra_conv)."""

import numpy as np
import pytest


@pytest.mark.parametrize("g,m,q,k", [(8, 2, 2, 3), (16, 2, 1, 3),
                                     (8, 4, 2, 5), (12, 3, 3, 1)])
def test_small_group_conv_matches_grouped(rng, g, m, q, k):
    import jax.numpy as jnp

    from image_restoration_tpu.ops.common import _small_group_conv, conv2d

    cin, cout = g * m, g * q
    x = jnp.asarray(rng.standard_normal((2, 10, 12, cin), dtype=np.float32))
    kern = jnp.asarray(rng.standard_normal((k, k, m, cout), dtype=np.float32))
    bias = jnp.asarray(rng.standard_normal((cout,), dtype=np.float32))
    ref = conv2d(x, kern, bias, padding=k // 2, groups=g)
    got = _small_group_conv(x, kern, bias, k // 2, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
