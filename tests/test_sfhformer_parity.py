"""SFHformer parity vs the reference torch implementation (incl. BatchNorm
running-stats import)."""

import numpy as np
import pytest

from conftest import load_reference_module, nchw_to_nhwc, stub_common_modules

torch = pytest.importorskip("torch")


def test_sfhformer_parity(rng):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.sfhformer import SFHformer
    from image_restoration_tpu.utils.torch_import import import_variables

    stub_common_modules()
    ref = load_reference_module("SFHformer.py", "ref_sfh")

    torch.manual_seed(0)
    tnet = ref.Backbone(patch_size=1, embed_dim=[8, 16, 32, 16, 8],
                        depth=[1, 1, 1, 1, 1], embed_kernel_size=3)
    # make running stats non-trivial by a few training forwards
    tnet.train()
    with torch.no_grad():
        for _ in range(3):
            tnet(torch.rand(2, 3, 16, 16))
    tnet.eval()

    jnet = SFHformer(embed_dim=(8, 16, 32, 16, 8), depth=(1, 1, 1, 1, 1))

    x = rng.random((1, 3, 16, 16), dtype=np.float32)
    with torch.no_grad():
        ref_out = tnet(torch.from_numpy(x)).numpy()

    xj = jnp.asarray(nchw_to_nhwc(x))
    variables = jnet.init(jax.random.PRNGKey(0), xj)
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    variables = import_variables(dict(variables), sd)
    got = jnet.apply(variables, xj)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref_out, rtol=3e-4, atol=3e-4)


def test_batchnorm_train_updates(rng):
    """BatchNorm2d train mode matches torch batch-stat semantics."""
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.ops.layernorm import BatchNorm2d

    x = rng.standard_normal((4, 6, 5, 8), dtype=np.float32) * 2 + 1
    bn = BatchNorm2d()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out, mutated = bn.apply(variables, jnp.asarray(x), train=True,
                            mutable=["batch_stats"])

    tbn = torch.nn.BatchNorm2d(8)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    ref = tbn(xt).detach().numpy()
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)), ref,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["running_mean"]),
        tbn.running_mean.detach().numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["running_var"]),
        tbn.running_var.detach().numpy(), rtol=1e-4, atol=1e-6)
