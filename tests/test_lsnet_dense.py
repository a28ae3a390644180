"""LSNet dense-prediction engines: FPN/RetinaNet/SemanticFPN (the TPU-native
equivalent of the reference's mm* detection/segmentation stacks)."""

import numpy as np
import pytest


def test_anchors_and_boxcoder_roundtrip():
    import jax.numpy as jnp

    from image_restoration_tpu.models.lsnet_dense import (
        box_iou, decode_deltas, encode_deltas, make_anchors,
    )

    anchors = make_anchors([(8, 8), (4, 4)], [16, 32])
    assert anchors.shape == (8 * 8 * 9 + 4 * 4 * 9, 4)
    # sane geometry: x2>x1, y2>y1
    assert float(jnp.min(anchors[:, 2] - anchors[:, 0])) > 0

    boxes = jnp.asarray([[10.0, 12, 60, 90], [5, 5, 30, 25]])
    sub = anchors[: boxes.shape[0]]
    deltas = encode_deltas(sub, boxes)
    back = decode_deltas(sub, deltas)
    np.testing.assert_allclose(np.asarray(back), np.asarray(boxes),
                               rtol=1e-4, atol=1e-3)

    iou = box_iou(boxes, boxes)
    np.testing.assert_allclose(np.diag(np.asarray(iou)), 1.0, atol=1e-6)


@pytest.fixture(scope="module")
def det_model():
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.lsnet_dense import RetinaNetLSNet

    model = RetinaNetLSNet(num_classes=5, embed_dim=(16, 32, 48, 64),
                           depth=(1, 1, 1, 1), img_size=128, fpn_dim=32)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params, x


def test_retinanet_forward_shapes(det_model):
    model, params, x = det_model
    cls, box, sizes = model.apply(params, x)
    # strides 8/16/32/64 + P6/P7
    assert sizes == [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]
    n_anchors = sum(h * w * 9 for h, w in sizes)
    assert cls.shape == (1, n_anchors, 5)
    assert box.shape == (1, n_anchors, 4)


def test_retinanet_loss_and_assignment(det_model):
    import jax.numpy as jnp

    from image_restoration_tpu.models.lsnet_dense import (
        make_anchors, retinanet_loss,
    )

    model, params, x = det_model
    cls, box, sizes = model.apply(params, x)
    anchors = make_anchors(sizes, model.anchor_strides())
    gt_boxes = jnp.asarray([[8.0, 8, 72, 72], [0, 0, 0, 0]])
    gt_labels = jnp.asarray([2, 0], jnp.int32)
    gt_valid = jnp.asarray([True, False])
    cl, bl = retinanet_loss(cls[0], box[0], anchors, gt_boxes, gt_labels,
                            gt_valid, num_classes=5)
    assert np.isfinite(float(cl)) and np.isfinite(float(bl))
    assert float(cl) > 0 and float(bl) >= 0

    # an exactly-predicted assignment scores lower cls loss than random init
    good_logits = jnp.full_like(cls[0], -20.0)
    cl2, _ = retinanet_loss(good_logits, box[0], anchors, gt_boxes, gt_labels,
                            gt_valid, num_classes=5)
    assert float(cl2) < float(cl) * 5  # finite & comparable path


def test_decode_nms():
    import jax.numpy as jnp

    from image_restoration_tpu.models.lsnet_dense import decode_detections

    anchors = jnp.asarray([[0.0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]])
    deltas = jnp.zeros((3, 4))
    # logits: anchor0 class0 strong, anchor1 class0 slightly weaker
    # (overlapping, same class -> suppressed), anchor2 class1 strong
    logits = jnp.full((3, 2), -10.0)
    logits = logits.at[0, 0].set(4.0).at[1, 0].set(3.0).at[2, 1].set(4.0)
    boxes, scores, labels = decode_detections(logits, deltas, anchors,
                                              top_k=6, iou_thr=0.5, max_det=4)
    kept = np.asarray(scores) > 0
    assert kept.sum() == 2
    assert set(np.asarray(labels)[kept].tolist()) == {0, 1}
    # different class overlap is NOT suppressed
    logits2 = jnp.full((3, 2), -10.0)
    logits2 = logits2.at[0, 0].set(4.0).at[1, 1].set(3.0)
    _, s2, _ = decode_detections(logits2, deltas, anchors, top_k=6,
                                 iou_thr=0.5, max_det=4)
    assert (np.asarray(s2) > 0).sum() == 2


def test_semantic_fpn(rng):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.lsnet_dense import (
        SemanticFPNLSNet, mean_iou, segmentation_ce_loss,
    )

    model = SemanticFPNLSNet(num_classes=4, embed_dim=(16, 32, 48, 64),
                             depth=(1, 1, 1, 1), img_size=64, fpn_dim=32,
                             seg_dim=32)
    x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(params, x)
    assert logits.shape == (1, 64, 64, 4)

    labels = jnp.zeros((1, 64, 64), jnp.int32).at[:, :32].set(1)
    loss = segmentation_ce_loss(logits, labels)
    assert np.isfinite(float(loss)) and float(loss) > 0

    miou, _ = mean_iou(labels, labels, 4)
    np.testing.assert_allclose(float(miou), 1.0)
