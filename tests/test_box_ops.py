import numpy as np
import jax.numpy as jnp

from ziragroundingdino_tpu.ops import box_ops


def _rand_boxes(rng, n):
    xy = rng.random((n, 2)).astype(np.float32)
    wh = rng.random((n, 2)).astype(np.float32) * 0.5 + 0.01
    return np.concatenate([xy, wh], axis=-1)  # cxcywh


def test_cxcywh_roundtrip():
    rng = np.random.default_rng(0)
    b = _rand_boxes(rng, 17)
    xyxy = box_ops.box_cxcywh_to_xyxy(jnp.asarray(b))
    back = box_ops.box_xyxy_to_cxcywh(xyxy)
    np.testing.assert_allclose(np.asarray(back), b, rtol=1e-6, atol=1e-6)


def test_giou_matrix_against_torchvision_formula():
    import torch
    from torch import Tensor

    def torch_giou(b1: Tensor, b2: Tensor) -> Tensor:
        # reference formula, `util/box_ops.py:44-65`
        area1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
        area2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
        lt = torch.max(b1[:, None, :2], b2[:, :2])
        rb = torch.min(b1[:, None, 2:], b2[:, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[..., 0] * wh[..., 1]
        union = area1[:, None] + area2 - inter
        iou = inter / union
        lt2 = torch.min(b1[:, None, :2], b2[:, :2])
        rb2 = torch.max(b1[:, None, 2:], b2[:, 2:])
        wh2 = (rb2 - lt2).clamp(min=0)
        area = wh2[..., 0] * wh2[..., 1]
        return iou - (area - union) / area

    rng = np.random.default_rng(1)
    a = np.asarray(box_ops.box_cxcywh_to_xyxy(jnp.asarray(_rand_boxes(rng, 8))))
    b = np.asarray(box_ops.box_cxcywh_to_xyxy(jnp.asarray(_rand_boxes(rng, 5))))
    ours = np.asarray(box_ops.generalized_box_iou_matrix(jnp.asarray(a), jnp.asarray(b)))
    ref = torch_giou(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_elementwise_matches_matrix_diagonal():
    rng = np.random.default_rng(2)
    a = np.asarray(box_ops.box_cxcywh_to_xyxy(jnp.asarray(_rand_boxes(rng, 6))))
    b = np.asarray(box_ops.box_cxcywh_to_xyxy(jnp.asarray(_rand_boxes(rng, 6))))
    m = np.asarray(box_ops.generalized_box_iou_matrix(jnp.asarray(a), jnp.asarray(b)))
    e = np.asarray(box_ops.generalized_box_iou_elementwise(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(np.diagonal(m), e, rtol=1e-5, atol=1e-6)


def test_inverse_sigmoid():
    x = jnp.asarray([0.0, 0.5, 1.0, 0.2])
    y = box_ops.inverse_sigmoid(x)
    # clamped at eps=1e-3 like the reference (`util/misc.py:704-709`)
    np.testing.assert_allclose(float(y[1]), 0.0, atol=1e-6)
    # x=0: log(clip(0,eps) / clip(1,eps)) = log(1e-3), per `util/misc.py:704-709`
    np.testing.assert_allclose(float(y[0]), float(np.log(1e-3)), rtol=1e-5)
    assert np.isfinite(np.asarray(y)).all()
