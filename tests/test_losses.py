"""Loss parity vs the reference formulas (re-expressed in torch here)."""

import numpy as np
import pytest

from conftest import nhwc_to_nchw

torch = pytest.importorskip("torch")


@pytest.fixture
def pair(rng):
    a = rng.random((2, 16, 20, 3), dtype=np.float32)
    b = rng.random((2, 16, 20, 3), dtype=np.float32)
    return a, b


def test_charbonnier(pair):
    from image_restoration_tpu.train.losses import charbonnier_loss

    a, b = pair
    d = torch.from_numpy(a) - torch.from_numpy(b)
    ref = torch.mean(torch.sqrt(d * d + 1e-6)).item()
    np.testing.assert_allclose(float(charbonnier_loss(a, b)), ref, rtol=1e-5)


def test_fft_loss_stacked(pair):
    from image_restoration_tpu.train.losses import fft_loss

    a, b = pair
    # reference FFTLoss: L1 over stacked real/imag of rfft2 on NCHW tensors
    pf = torch.fft.rfft2(torch.from_numpy(nhwc_to_nchw(a)))
    tf = torch.fft.rfft2(torch.from_numpy(nhwc_to_nchw(b)))
    ps = torch.stack([pf.real, pf.imag], dim=-1)
    ts = torch.stack([tf.real, tf.imag], dim=-1)
    ref = torch.nn.functional.l1_loss(ps, ts).item()
    np.testing.assert_allclose(float(fft_loss(a, b)), ref, rtol=1e-4)


def test_fft_abs_loss(pair):
    from image_restoration_tpu.train.losses import fft_abs_loss

    a, b = pair
    d = torch.fft.fft2(torch.from_numpy(nhwc_to_nchw(a))) - torch.fft.fft2(
        torch.from_numpy(nhwc_to_nchw(b))
    )
    ref = torch.mean(torch.abs(d)).item()
    np.testing.assert_allclose(float(fft_abs_loss(a, b)), ref, rtol=1e-4)


def test_edge_loss(pair):
    from image_restoration_tpu.train.losses import edge_loss

    a, b = pair
    # reference EdgeLoss.laplacian_kernel in torch
    k1 = torch.tensor([[0.05, 0.25, 0.4, 0.25, 0.05]])
    kernel = (k1.t() @ k1).unsqueeze(0).repeat(3, 1, 1, 1)

    def conv_gauss(img):
        img = torch.nn.functional.pad(img, (2, 2, 2, 2), mode="replicate")
        return torch.nn.functional.conv2d(img, kernel, groups=3)

    def lap(cur):
        filtered = conv_gauss(cur)
        down = filtered[:, :, ::2, ::2]
        nf = torch.zeros_like(filtered)
        nf[:, :, ::2, ::2] = down * 4
        return cur - conv_gauss(nf)

    la = lap(torch.from_numpy(nhwc_to_nchw(a)))
    lb = lap(torch.from_numpy(nhwc_to_nchw(b)))
    ref = torch.mean(torch.sqrt((la - lb) ** 2 + 1e-6)).item()
    np.testing.assert_allclose(float(edge_loss(a, b)), ref, rtol=1e-4, atol=1e-6)


def test_focal_smooth_pearson(pair):
    from image_restoration_tpu.train.losses import (
        focal_l1_loss,
        pearson_loss,
        smooth_l1_loss,
    )

    a, b = pair
    at, bt = torch.from_numpy(a), torch.from_numpy(b)
    abs_err = torch.abs(at - bt) / 0.1
    ref = ((torch.log(1 + abs_err + 1e-6) ** 2.0) * abs_err).mean().item()
    np.testing.assert_allclose(float(focal_l1_loss(a, b)), ref, rtol=1e-4)

    ref = torch.nn.functional.smooth_l1_loss(at, bt).item()
    np.testing.assert_allclose(float(smooth_l1_loss(a, b)), ref, rtol=1e-5)

    pa = at.reshape(2, -1)
    pb = bt.reshape(2, -1)
    vx = pa - pa.mean(1, keepdim=True)
    vy = pb - pb.mean(1, keepdim=True)
    corr = (vx * vy).sum(1) / ((vx**2).sum(1).sqrt() * (vy**2).sum(1).sqrt() + 1e-8)
    np.testing.assert_allclose(float(pearson_loss(a, b)), (1 - corr).mean().item(), rtol=1e-4)


def test_schedulers_match_reference_formulas():
    import numpy as np

    from image_restoration_tpu.train.schedulers import (
        cosine_annealing_restart_cyclic,
        linear_warmup_cosine,
        multistep,
        vibrate,
    )

    import math

    # LinearWarmupCosineAnnealing closed form
    s = linear_warmup_cosine(2e-4, warmup_steps=15, max_steps=150, eta_min=1e-6)
    for step in [0, 1, 14, 15, 80, 150]:
        if step < 15:
            ref = 0.0 + (2e-4 - 0.0) * step / 15
        else:
            ref = 1e-6 + 0.5 * (2e-4 - 1e-6) * (1 + math.cos(math.pi * (step - 15) / 135))
        np.testing.assert_allclose(float(s(step)), ref, rtol=1e-5, atol=1e-12)

    # CosineAnnealingRestartCyclic (HOGformer config shape)
    s = cosine_annealing_restart_cyclic(3e-4, [92000, 208000], [1, 1], [3e-4, 1e-6])
    for step in [0, 1000, 91999, 92000, 92001, 200000, 299999]:
        cum = [92000, 300000]
        idx = 0 if step <= 92000 else 1
        start = 0 if idx == 0 else 92000
        period = [92000, 208000][idx]
        emin = [3e-4, 1e-6][idx]
        ref = emin + 0.5 * (3e-4 - emin) * (1 + math.cos(math.pi * (step - start) / period))
        np.testing.assert_allclose(float(s(step)), ref, rtol=1e-5)

    s = multistep(1e-3, [10, 20], 0.5)
    assert abs(float(s(5)) - 1e-3) < 1e-9
    assert abs(float(s(15)) - 5e-4) < 1e-9
    assert abs(float(s(25)) - 2.5e-4) < 1e-9

    s = vibrate(1e-3, 8000)
    assert 0 < float(s(0)) <= 1e-3
    assert float(s(7999)) >= 0


def test_train_step_decreases_loss():
    """End-to-end trainer smoke on the 8-device mesh: loss decreases on an
    overfit-one-batch task."""
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.core.mesh import make_mesh
    from image_restoration_tpu.models.restormer import Restormer
    from image_restoration_tpu.train.trainer import (
        TrainerConfig,
        TrainState,
        make_optimizer,
        make_train_step,
        replicate,
        shard_batch,
    )

    mesh = make_mesh(None, ("data",))
    model = Restormer(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
                      heads=(1, 2, 4, 8))
    cfg = TrainerConfig(learning_rate=1e-3, loss={"l1": 1.0, "fft": 0.1},
                        grad_clip=1.0, ema_decay=0.99)
    tx = make_optimizer(cfg)

    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (8, 16, 16, 3))
    y = jnp.clip(x + 0.1, 0, 1)
    params = model.init(rng, x)["params"]
    state = TrainState.create(params, tx, ema_decay=cfg.ema_decay)

    step = make_train_step(model, tx, cfg, mesh=mesh)
    with mesh:
        state = replicate(state, mesh)
        batch = shard_batch({"lq": x, "gt": y}, mesh)
        losses = []
        for i in range(8):
            state, logs = step(state, batch, jax.random.fold_in(rng, i))
            losses.append(float(logs["total"]))
    assert losses[-1] < losses[0] * 0.9, losses
    assert int(state.step) == 8
    assert state.ema_params is not None


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.train.checkpoint import (
        CheckpointManager,
        load_params_npz,
        save_params_npz,
    )

    params = {"a": {"w": jnp.arange(6.0).reshape(2, 3)}, "b": jnp.ones((4,))}
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_every=2)
    assert not mgr.save(1, params)          # not on schedule
    assert mgr.save(2, params)              # on schedule
    assert mgr.latest_step() == 2
    restored, step = mgr.restore(jax.tree.map(jnp.zeros_like, params))
    assert step == 2
    np.testing.assert_array_equal(np.asarray(restored["a"]["w"]), np.arange(6).reshape(2, 3))

    assert mgr.maybe_save_best(3, params, psnr=30.0)
    assert not mgr.maybe_save_best(4, params, psnr=29.0)

    p = str(tmp_path / "p.npz")
    save_params_npz(p, params)
    back = load_params_npz(p, params)
    np.testing.assert_array_equal(np.asarray(back["b"]), np.ones(4))


def test_contrastive_style_losses_vs_vendored():
    """MWFormer style-filter ContrastiveLoss + SupCon vs the vendored
    pytorch_metric_learning package."""
    import sys

    import jax.numpy as jnp

    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference/MWFormer")
    try:
        from pytorch_metric_learning import losses as tml
        from pytorch_metric_learning.distances import CosineSimilarity
        from pytorch_metric_learning.reducers import MeanReducer
    except ImportError:
        pytest.skip("vendored pytorch_metric_learning unavailable")
    finally:
        sys.path.remove("/root/reference/MWFormer")

    from image_restoration_tpu.train.losses import (
        contrastive_style_loss,
        supcon_loss,
    )

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((8, 16)).astype(np.float32)
    lab = np.array([0, 0, 1, 1, 2, 2, 0, 1])
    tc = tml.ContrastiveLoss(pos_margin=0.5, neg_margin=0,
                             distance=CosineSimilarity(), reducer=MeanReducer())
    ref = float(tc(torch.from_numpy(emb), torch.from_numpy(lab)))
    got = float(contrastive_style_loss(jnp.asarray(emb), jnp.asarray(lab)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)

    ts = tml.SupConLoss(temperature=0.1)
    refs = float(ts(torch.from_numpy(emb), torch.from_numpy(lab)))
    gots = float(supcon_loss(jnp.asarray(emb), jnp.asarray(lab)))
    np.testing.assert_allclose(gots, refs, rtol=1e-5)
