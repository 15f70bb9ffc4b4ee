"""Batched, data-parallel train step for the proposal network.

Reference lineage: the one place the reference is genuinely distributed is
its detector training — maskrcnn-benchmark's `tools/train_net.py` wraps the
model in DistributedDataParallel over NCCL (SURVEY.md §3.3 DP row, §3.2
component 18). The TPU-native equivalent is declarative, mirroring
train/loop.py: the per-image detection losses (RPN + box head + mask head)
are `jax.vmap`-ed over a batch axis, that axis is sharded over the mesh
"data" axis, params stay replicated, and XLA SPMD emits the gradient
all-reduce over ICI. No hand-written collectives.

The per-image loss closes over frozen `batch_stats` (the detector trains
with frozen BN, matching the reference's FrozenBatchNorm2d detector
backbone).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from dmm_net_tpu.models.proposal.losses import (assign_proposals,
                                                box_head_loss,
                                                mask_head_loss, rpn_loss)
from dmm_net_tpu.models.proposal.maskrcnn import MaskRCNN
from dmm_net_tpu.parallel.mesh import batch_sharding, replicated_sharding


def proposal_image_loss(model: MaskRCNN, params, batch_stats, img,
                        gt_boxes, gt_labels, gt_valid, gt_masks):
    """Detection loss for ONE image (img (H, W, 3); gt_* unbatched)."""
    out = model.apply({"params": params, "batch_stats": batch_stats},
                      img[None], method=MaskRCNN.train_forward)
    l_rpn = rpn_loss(out["rpn_objectness"], out["rpn_deltas"],
                     out["anchors"], gt_boxes, gt_valid)
    l_box = box_head_loss(out["cls_scores"], out["box_deltas"],
                          out["proposals"], out["prop_valid"],
                          gt_boxes, gt_labels, gt_valid)
    cls_t, matched = assign_proposals(out["proposals"], out["prop_valid"],
                                      gt_boxes, gt_labels, gt_valid)
    l_mask = mask_head_loss(out["mask_logits"], out["proposals"],
                            cls_t, matched, gt_masks)
    total = (l_rpn["rpn_cls"] + l_rpn["rpn_reg"] +
             l_box["box_cls"] + l_box["box_reg"] + l_mask)
    return total, {**l_rpn, **l_box, "mask": l_mask}


def make_proposal_batch_loss(model: MaskRCNN, batch_stats):
    """Mean detection loss over a batch dict {images (B,H,W,3), boxes
    (B,G,4), labels (B,G), valid (B,G), masks (B,G,H,W)} — the vmapped
    per-image losses (each image runs the B=1 train_forward, so RPN
    top-k/NMS selection is per-image and batch-size independent)."""

    def batch_loss(params, batch):
        losses, parts = jax.vmap(
            lambda i, gb, gl, gv, gm: proposal_image_loss(
                model, params, batch_stats, i, gb, gl, gv, gm),
        )(batch["images"], batch["boxes"], batch["labels"],
          batch["valid"], batch["masks"])
        return jnp.mean(losses), jax.tree.map(jnp.mean, parts)

    return batch_loss


def make_proposal_train_step(model: MaskRCNN, tx: optax.GradientTransformation,
                             batch_stats, mesh: Optional[Mesh] = None):
    """Jitted step over a batch dict (see make_proposal_batch_loss) ->
    (params, opt_state, loss, parts). With a mesh, the batch axis is
    sharded on "data" and params/opt_state are replicated (input batches
    should be placed with `parallel.mesh.shard_batch`)."""

    batch_loss = make_proposal_batch_loss(model, batch_stats)

    def step(params, opt_state, batch):
        (loss, parts), grads = jax.value_and_grad(
            batch_loss, has_aux=True)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, parts

    if mesh is None:
        return jax.jit(step)
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(step, in_shardings=(repl, repl, data),
                   out_shardings=(repl, repl, repl, repl))
