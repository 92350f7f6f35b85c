"""Training criterion: focal + dice mask loss and IoU-prediction MSE.

Equivalent of the reference's loss.py: ``dice_loss`` (:9-55, eps=1e-3 on
sigmoid probabilities), ``compute_mask_loss`` = mean focal (alpha=-1,
gamma=2, i.e. unweighted) + 2 * dice per multimask channel (:58-77),
``compute_iou`` hard-thresholded (:80-98), ``compute_jaccard`` soft (:101-107),
and ``Criterion`` (:110-158): on the first click iteration the *min-loss*
mask of the multimask outputs supervises (SAM's ambiguity-aware trick), later
iterations have a single mask; total = mean over iterations of
(mask loss + mse(IoU, IoU prediction)).

All pure functions over fp32 logits; safe under jit/grad.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float = -1.0,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Elementwise focal loss on logits (torchvision semantics: alpha < 0
    disables class weighting, as the reference uses, loss.py:74)."""
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets)
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    return loss


def optax_sigmoid_ce(logits, labels):
    """Numerically stable binary cross-entropy with logits."""
    return jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def dice_loss(probs: jnp.ndarray, targets: jnp.ndarray, eps: float = 1e-3):
    """Soft dice over the last axis (reference loss.py:9-55)."""
    numerator = 2.0 * jnp.sum(probs * targets, axis=-1)
    denominator = jnp.sum(jnp.square(probs), axis=-1) + jnp.sum(targets, axis=-1)
    return 1.0 - (numerator + eps) / (denominator + eps)


def compute_mask_loss(
    logits: jnp.ndarray, labels: jnp.ndarray, loss_weight_dice: float = 2.0
) -> jnp.ndarray:
    """[B, C, N] logits vs [B, N] binary labels -> [B, C] per-mask loss."""
    labels_f = labels[:, None, :].astype(logits.dtype)
    labels_f = jnp.broadcast_to(labels_f, logits.shape)
    loss_ce = sigmoid_focal_loss(logits, labels_f)
    loss_dice = dice_loss(jax.nn.sigmoid(logits), labels_f)
    return jnp.mean(loss_ce, axis=-1) + loss_weight_dice * loss_dice


def compute_iou(
    logits: jnp.ndarray, targets: jnp.ndarray, threshold: float | None = None
) -> jnp.ndarray:
    """Hard IoU of thresholded predictions (reference loss.py:80-98)."""
    if threshold is None:
        preds = logits > 0
    else:
        preds = jax.nn.sigmoid(logits) > threshold
    inter = jnp.sum(preds & targets, axis=-1)
    union = jnp.sum(preds | targets, axis=-1)
    return inter / jnp.maximum(union, 1)


def compute_jaccard(logits, targets, eps: float = 1e-3):
    probs = jax.nn.sigmoid(logits)
    t = targets.astype(probs.dtype)
    numerator = jnp.sum(probs * t, axis=-1)
    denominator = (
        jnp.sum(jnp.square(probs) + jnp.square(t), axis=-1) - numerator
    )
    return (numerator + eps) / (denominator + eps)


def criterion(
    outputs: list[dict],
    gt_masks: jnp.ndarray,
    use_soft_iou: bool = False,
) -> tuple[jnp.ndarray, list[dict]]:
    """Reference Criterion.forward (loss.py:115-158).

    Args:
        outputs: per-iteration dicts from PointCloudSAM.__call__ with
            masks [B*M, C, N] and iou_preds [B*M, C].
        gt_masks: [B*M, N] bool (flattened mask batch).

    Returns:
        (scalar loss, per-iteration aux dicts {iou, best_masks, loss_mask,
        loss_iou}).
    """
    losses = []
    aux_outputs = []
    for i, output in enumerate(outputs):
        masks = output["masks"].astype(jnp.float32)  # [B*M, C, N]
        iou_preds = output["iou_preds"].astype(jnp.float32)  # [B*M, C]

        loss_mask = compute_mask_loss(masks, gt_masks)  # [B*M, C]
        if i == 0:
            min_loss_idx = jnp.argmin(loss_mask, axis=1)  # [B*M]
            loss_mask = jnp.min(loss_mask, axis=1)
            best_masks = jnp.take_along_axis(
                masks, min_loss_idx[:, None, None], axis=1
            )[:, 0]
            iou_preds = jnp.take_along_axis(
                iou_preds, min_loss_idx[:, None], axis=1
            )[:, 0]
        else:
            best_masks = masks[:, 0]
            iou_preds = iou_preds[:, 0]
        loss_mask = jnp.mean(loss_mask)

        iou = compute_iou(best_masks, gt_masks)  # [B*M]
        if use_soft_iou:
            target = jax.lax.stop_gradient(compute_jaccard(best_masks, gt_masks))
        else:
            target = iou.astype(jnp.float32)
        # Gradient flows through iou_preds only (the hard-IoU target is
        # non-differentiable anyway; stop_gradient makes that explicit).
        loss_iou = jnp.mean(
            jnp.square(jax.lax.stop_gradient(target) - iou_preds)
        )

        losses.append(loss_iou + loss_mask)
        aux_outputs.append(
            dict(iou=iou, best_masks=best_masks, loss_mask=loss_mask,
                 loss_iou=loss_iou)
        )
    return jnp.mean(jnp.stack(losses)), aux_outputs
