"""DACG-IR parity vs the reference torch implementation."""

import numpy as np
import pytest

from conftest import load_reference_module, nchw_to_nhwc, stub_common_modules

torch = pytest.importorskip("torch")


def test_dacg_ir_parity(rng):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.cg_ir import DACG_IR
    from image_restoration_tpu.utils.torch_import import import_state_dict

    stub_common_modules()
    ref = load_reference_module("20260104_CG_IR/src/net/model.py", "ref_cgir")

    torch.manual_seed(0)
    tnet = ref.DACG_IR(dim=8, num_blocks=[1, 1, 1, 1], num_refinement_blocks=1,
                       heads=[1, 2, 4, 8], context_dim=16).eval()
    jnet = DACG_IR(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
                   heads=(1, 2, 4, 8), context_dim=16)

    x = rng.random((2, 3, 16, 16), dtype=np.float32)
    with torch.no_grad():
        ref_out = tnet(torch.from_numpy(x)).numpy()

    xj = jnp.asarray(nchw_to_nhwc(x))
    params = jnet.init(jax.random.PRNGKey(0), xj)["params"]
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = import_state_dict(params, sd)
    got = np.transpose(np.asarray(jnet.apply({"params": params}, xj)), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref_out, rtol=3e-4, atol=3e-4)


def test_dacg_ir_fused_block_path_matches_plain(rng):
    """The CGTB fused-block path (canvas kernel + per-sample temperature +
    gate folded into A^T W_proj) must equal the plain module composition.
    On CPU the kernel runs its reference fallback, which pins the gate/temp
    plumbing and the fold math; TPU kernel numerics are covered by
    tools/check_fused_block.py."""
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.cg_ir import DACG_IR

    kw = dict(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
              heads=(1, 2, 4, 8), context_dim=16, num_scales=2)
    x = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    plain = DACG_IR(**kw)
    fused = DACG_IR(**kw, fused_block=True)
    params = plain.init(jax.random.PRNGKey(0), x)
    out_p = plain.apply(params, x)
    out_f = fused.apply(params, x)  # same param tree: twin names line up
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_f),
                               rtol=2e-4, atol=2e-4)

    # scan layout runs and matches the loop layout after stacking params
    from image_restoration_tpu.models.restormer import stack_scan_params

    scan = DACG_IR(**kw, fused_block=True, scan_blocks=True)
    stacked = {"params": stack_scan_params(params["params"])}
    out_s = scan.apply(stacked, x)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_s),
                               rtol=2e-4, atol=2e-4)
