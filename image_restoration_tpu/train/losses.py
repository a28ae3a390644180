"""Restoration losses (NHWC, differentiable, jit-safe).

Covers the zoo's loss inventory (SURVEY.md §2.3 Losses): L1 (default
everywhere), Charbonnier (NeRD-Rain losses.py:5-15), FFT losses in both
flavors (MoCE loss_utils.py:139-152 stacked-real/imag L1; NeRD losses.py:44-51
mean |fft diff|), Edge/Laplacian (loss_utils.py:155-190, losses.py:17-42),
PSNR loss (loss_utils.py:14-33), SSIM losses (pytorch_msssim flavor),
Focal-L1 (loss_utils.py:100-137), GAN (lsgan/bce, loss_utils.py:58-97),
Pearson correlation (HOGformer image_restoration_model.py:241-253).

FFTs run in fp32 islands regardless of activation dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from image_restoration_tpu.eval.metrics import ssim as _ssim_metric


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def mse_loss(pred, target):
    return jnp.mean(jnp.square(pred - target))


def smooth_l1_loss(pred, target, beta: float = 1.0):
    """torch F.smooth_l1_loss (TransWeather train.py:161)."""
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


def charbonnier_loss(pred, target, eps: float = 1e-3):
    diff = pred - target
    return jnp.mean(jnp.sqrt(diff * diff + eps * eps))


def psnr_loss(pred, target):
    """Negative mean-per-image PSNR (loss_utils.PSNRLoss)."""
    mse = jnp.mean(jnp.square(pred - target), axis=tuple(range(1, pred.ndim)))
    return -jnp.mean(10.0 * jnp.log10(1.0 / mse))


def ssim_loss(pred, target, data_range: float = 1.0):
    """1 - SSIM (loss_utils.SSIMloss; pytorch_msssim = gaussian, no sample cov)."""
    return 1.0 - jnp.mean(_ssim_metric(pred, target, data_range, sample_covariance=False))


def fft_loss(pred, target):
    """MoCE FFTLoss: L1 over stacked real/imag of rfft2 (spatial axes)."""
    pf = jnp.fft.rfft2(pred.astype(jnp.float32), axes=(1, 2))
    tf = jnp.fft.rfft2(target.astype(jnp.float32), axes=(1, 2))
    return 0.5 * (jnp.mean(jnp.abs(pf.real - tf.real)) + jnp.mean(jnp.abs(pf.imag - tf.imag)))


def fft_abs_loss(pred, target):
    """NeRD fftLoss: mean |fft2(x) - fft2(y)| (complex magnitude)."""
    d = jnp.fft.fft2(pred.astype(jnp.float32), axes=(1, 2)) - jnp.fft.fft2(
        target.astype(jnp.float32), axes=(1, 2)
    )
    return jnp.mean(jnp.abs(d))


def focal_l1_loss(pred, target, gamma: float = 2.0, epsilon: float = 1e-6,
                  alpha: float = 0.1):
    abs_err = jnp.abs(pred - target) / alpha
    w = jnp.log(1.0 + abs_err + epsilon) ** gamma
    return jnp.mean(w * abs_err)


# --- Laplacian edge loss ----------------------------------------------------

_GK1D = jnp.asarray([0.05, 0.25, 0.4, 0.25, 0.05], jnp.float32)


def _gauss_conv(img):
    """5x5 binomial blur, replicate padding, per channel. img: (B,H,W,C)."""
    c = img.shape[-1]
    k2d = jnp.outer(_GK1D, _GK1D).reshape(5, 5, 1, 1)
    k = jnp.tile(k2d, (1, 1, 1, c)).astype(img.dtype)
    img = jnp.pad(img, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="edge")
    dn = jax.lax.conv_dimension_numbers(img.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        img, k, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )


def laplacian_highpass(x):
    """Laplacian-of-Gaussian residual (EdgeLoss.laplacian_kernel): blur,
    decimate by 2, zero-stuff x4, re-blur, subtract."""
    filtered = _gauss_conv(x)
    down = filtered[:, ::2, ::2, :]
    up = jnp.zeros_like(filtered)
    up = up.at[:, ::2, ::2, :].set(down * 4.0)
    return x - _gauss_conv(up)


def edge_loss(pred, target, criterion: str = "charbonnier"):
    lp, lt = laplacian_highpass(pred), laplacian_highpass(target)
    if criterion == "l1":
        return jnp.mean(jnp.abs(lp - lt))
    if criterion == "l2":
        return jnp.mean(jnp.square(lp - lt))
    return charbonnier_loss(lp, lt)


# --- HOG loss ---------------------------------------------------------------

_SOBEL_X = jnp.asarray([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]],
                       jnp.float32)
_SOBEL_Y = _SOBEL_X.T


def _sobel(gray, k):
    """3x3 conv, zero padding=1 (torch F.conv2d padding=1). gray: (B,H,W,1)."""
    dn = jax.lax.conv_dimension_numbers(gray.shape, (3, 3, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        gray, k.reshape(3, 3, 1, 1), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=dn)


def hog_features(x, nbins: int = 9, cell_size: int = 8, block_size: int = 1,
                 signed_gradient: bool = False, eps: float = 1e-8):
    """Differentiable HOG descriptor (HOGformer HOGLayer,
    HOGformer-main/settingI/basicsr/models/image_restoration_model.py:25-101),
    NHWC. Rec.601 grayscale, Sobel gradients with zero pad, soft linear
    orientation binning (relu(1 - delta/bin_width)), cell_size average-pooled
    histograms, optional L2 block normalization (block_size>1, torch-unfold
    flatten order), flattened per image. x: (B,H,W,C), C in {1,3}."""
    x = x.astype(jnp.float32)
    if x.shape[-1] == 3:
        gray = (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])[..., None]
    else:
        gray = x
    dx = _sobel(gray, _SOBEL_X)
    dy = _sobel(gray, _SOBEL_Y)
    magnitude = jnp.sqrt(dx * dx + dy * dy + eps)        # (B,H,W,1)
    orientation = jnp.arctan2(dy, dx + eps)
    period = (2 * jnp.pi) if signed_gradient else jnp.pi
    bin_width = period / nbins
    if not signed_gradient:
        orientation = jnp.abs(orientation)               # map to [0, pi]
    angles = jnp.arange(nbins, dtype=jnp.float32) * bin_width
    delta = jnp.abs(orientation - angles.reshape(1, 1, 1, nbins))
    delta = jnp.minimum(delta, period - delta)
    weights = jax.nn.relu(1.0 - delta / bin_width)       # (B,H,W,nbins)

    b, h, w, _ = x.shape
    nh, nw = (h // cell_size) * cell_size, (w // cell_size) * cell_size
    weighted = (weights * magnitude)[:, :nh, :nw]
    hist = weighted.reshape(b, nh // cell_size, cell_size,
                            nw // cell_size, cell_size, nbins).mean(axis=(2, 4))
    hc, wc = hist.shape[1], hist.shape[2]
    if block_size > 1 and hc >= block_size and wc >= block_size:
        hp, wp = hc - block_size + 1, wc - block_size + 1
        # torch F.unfold order: channel-major (c, kh, kw), patches row-major
        hist_c = jnp.moveaxis(hist, -1, 1)               # (B, nbins, Hc, Wc)
        cols = jnp.stack(
            [hist_c[:, :, i : i + hp, j : j + wp]
             for i in range(block_size) for j in range(block_size)],
            axis=2)                                      # (B, C, k*k, hp, wp)
        cols = cols.reshape(b, nbins * block_size**2, hp * wp)
        blocks = jnp.swapaxes(cols, 1, 2)                # (B, L, C*k*k)
        norm = jnp.linalg.norm(blocks, axis=-1, keepdims=True)
        blocks = blocks / (norm + eps)
        return blocks.reshape(b, -1)
    return jnp.moveaxis(hist, -1, 1).reshape(b, -1)      # torch (B,C,Hc,Wc) flatten


def hog_loss(pred, target, nbins: int = 9, cell_size: int = 8,
             block_size: int = 1, signed_gradient: bool = False,
             loss_type: str = "l2"):
    """HOGLoss (image_restoration_model.py:103-143): descriptor distance.
    Training default is block_size=1 + MSE (:107-109,140-143)."""
    hp = hog_features(pred, nbins, cell_size, block_size, signed_gradient)
    ht = hog_features(target, nbins, cell_size, block_size, signed_gradient)
    if loss_type == "l1":
        return jnp.mean(jnp.abs(hp - ht))
    return jnp.mean(jnp.square(hp - ht))


# --- Gaussian pyramid (NeRD-Rain multi-scale supervision) -------------------

_PYR_K1D = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0], jnp.float32) / 16.0


def pyr_down(x):
    """kornia.geometry.transform.pyrdown semantics (used by
    NeRD-Rain-main/train.py:156 build_pyramid): 5x5 binomial blur with
    reflect border, then bilinear halving with align_corners=False — which
    for an exact /2 reduces to 2x2 average pooling. NHWC."""
    c = x.shape[-1]
    k = jnp.outer(_PYR_K1D, _PYR_K1D).reshape(5, 5, 1, 1)
    k = jnp.tile(k, (1, 1, 1, c)).astype(jnp.float32)
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (2, 2), (2, 2), (0, 0)),
                 mode="reflect")
    dn = jax.lax.conv_dimension_numbers(xp.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    blur = jax.lax.conv_general_dilated(xp, k, (1, 1), "VALID",
                                        dimension_numbers=dn,
                                        feature_group_count=c)
    b, h, w, _ = blur.shape
    return blur.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def build_pyramid(x, levels: int = 3):
    """[x, pyrdown(x), pyrdown^2(x), ...] — kornia build_pyramid."""
    out = [x.astype(jnp.float32)]
    for _ in range(levels - 1):
        out.append(pyr_down(out[-1]))
    return out


def gan_loss(logits, target_is_real: bool, use_lsgan: bool = True):
    t = jnp.full_like(logits, 1.0 if target_is_real else 0.0)
    if use_lsgan:
        return jnp.mean(jnp.square(logits - t))
    p = jnp.clip(logits, 1e-7, 1 - 1e-7)
    return -jnp.mean(t * jnp.log(p) + (1 - t) * jnp.log(1 - p))


def pearson_loss(pred, target, eps: float = 1e-8):
    """1 - Pearson correlation over flattened images (HOGformer recipe)."""
    p = pred.reshape(pred.shape[0], -1)
    t = target.reshape(target.shape[0], -1)
    p = p - jnp.mean(p, axis=1, keepdims=True)
    t = t - jnp.mean(t, axis=1, keepdims=True)
    num = jnp.sum(p * t, axis=1)
    den = jnp.sqrt(jnp.sum(p * p, axis=1) * jnp.sum(t * t, axis=1)) + eps
    return jnp.mean(1.0 - num / den)


def gradient_smoothness_loss(pred, target=None):
    """PINN 'physical constraint': mean |∂x| + mean |∂y| of the prediction
    (PINN_Image_Restoration/model.py:30-36). ``target`` ignored — the prior
    is on the prediction alone (used as mse + this, model.py:66-71)."""
    gx = pred[:, 1:, :, :] - pred[:, :-1, :, :]
    gy = pred[:, :, 1:, :] - pred[:, :, :-1, :]
    return jnp.mean(jnp.abs(gx)) + jnp.mean(jnp.abs(gy))


def contrastive_style_loss(embeddings, labels, pos_margin: float = 0.5,
                           neg_margin: float = 0.0, eps: float = 1e-8):
    """Pairwise contrastive loss over cosine similarity — the MWFormer
    style-filter recipe (MWFormer/main_train_style.py:76-81:
    ContrastiveLoss(pos_margin=0.5, neg_margin=0, distance=CosineSimilarity,
    reducer=MeanReducer)).

    Positive pairs (same weather label) pay relu(pos_margin - sim); negative
    pairs pay relu(sim - neg_margin); each set is averaged, then summed.
    """
    e = embeddings / (jnp.linalg.norm(embeddings, axis=-1, keepdims=True) + eps)
    sim = e @ e.T
    same = labels[:, None] == labels[None, :]
    off = ~jnp.eye(labels.shape[0], dtype=bool)
    pos_mask = (same & off).astype(sim.dtype)
    neg_mask = (~same).astype(sim.dtype)
    pos = jax.nn.relu(pos_margin - sim) * pos_mask
    neg = jax.nn.relu(sim - neg_margin) * neg_mask
    pos_loss = jnp.sum(pos) / jnp.maximum(jnp.sum(pos_mask), 1.0)
    neg_loss = jnp.sum(neg) / jnp.maximum(jnp.sum(neg_mask), 1.0)
    return pos_loss + neg_loss


def supcon_loss(embeddings, labels, temperature: float = 0.1, eps: float = 1e-8):
    """Supervised contrastive loss (vendored SupConLoss,
    MWFormer/pytorch_metric_learning/losses/supcon_loss.py; also the
    CrossRecNet loss_function.py recipe): per anchor,
    -log( sum_pos exp(sim/t) / sum_all exp(sim/t) ), averaged over anchors
    that have at least one positive.
    """
    e = embeddings / (jnp.linalg.norm(embeddings, axis=-1, keepdims=True) + eps)
    sim = (e @ e.T) / temperature
    n = labels.shape[0]
    off = ~jnp.eye(n, dtype=bool)
    same = (labels[:, None] == labels[None, :]) & off
    simm = jnp.where(off, sim, -jnp.inf)
    logz = jax.nn.logsumexp(simm, axis=1)
    pos_cnt = jnp.sum(same, axis=1)
    # per anchor: mean over positives of -(sim - logZ)  (SupCon-"out")
    sum_pos = jnp.sum(jnp.where(same, sim - logz[:, None], 0.0), axis=1)
    per_anchor = -sum_pos / jnp.maximum(pos_cnt, 1)
    valid = pos_cnt > 0
    return jnp.sum(jnp.where(valid, per_anchor, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1)


LOSSES = {
    "l1": l1_loss,
    "l2": mse_loss,
    "mse": mse_loss,
    "smooth_l1": smooth_l1_loss,
    "charbonnier": charbonnier_loss,
    "psnr": psnr_loss,
    "ssim": ssim_loss,
    "fft": fft_loss,
    "fft_abs": fft_abs_loss,
    "focal_l1": focal_l1_loss,
    "edge": edge_loss,
    "pearson": pearson_loss,
    "grad_smooth": gradient_smoothness_loss,
    "hog": hog_loss,
}


def weighted_loss(terms):
    """Compose {name: weight} into one callable(pred, target)."""

    def fn(pred, target):
        total = 0.0
        logs = {}
        for name, w in terms.items():
            v = LOSSES[name](pred, target)
            logs[name] = v
            total = total + w * v
        return total, logs

    return fn
