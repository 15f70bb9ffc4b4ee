"""Data-parallel proposal-net training (SURVEY.md §3.3 DP row: the
reference trains its detector with DistributedDataParallel over NCCL —
dep:maskrcnn-benchmark tools/train_net.py). Here: vmapped per-image
detection losses, batch axis sharded over the fake 8-CPU mesh, params
replicated.

The load-bearing equality is at the GRADIENT level: if the batch were
mis-sharded or the all-reduce missing, each device's gradient would
cover 1/8 of the data and differ from the full-batch gradient at O(1).
Measured agreement is ~4e-7 relative L2; post-AdamW params are NOT
compared exactly — Adam's g/(sqrt(v)+eps) normalization amplifies
float-reassociation noise between the two partitionings to ~the update
size for near-zero gradients (observed max 2.5e-5 with lr=1e-4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dmm_net_tpu.data.synthetic import synthetic_detection_frame
from dmm_net_tpu.models.proposal.maskrcnn import MaskRCNN
from dmm_net_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                       replicated_sharding, shard_batch)
from dmm_net_tpu.train.proposal_loop import (make_proposal_batch_loss,
                                             make_proposal_train_step)

H = W = 64
B = 8


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 fake CPU devices")
    model = MaskRCNN(image_size=(H, W), backbone_name="resnet18",
                     num_classes=3, pre_nms_top_n=32, post_nms_top_n=16,
                     max_detections=8)
    rows = [synthetic_detection_frame(seed=s, H=H, W=W, max_objects=4,
                                      num_classes=3) for s in range(B)]
    batch = {"images": np.stack([r["image"] for r in rows]),
             "boxes": np.stack([r["boxes"] for r in rows]),
             "labels": np.stack([r["labels"] for r in rows]),
             "valid": np.stack([r["valid"] for r in rows]),
             "masks": np.stack([r["masks"] for r in rows])}
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(batch["images"][:1]))
    return model, variables, batch


def test_sharded_proposal_grads_match_single_device(setup):
    model, variables, batch = setup
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    batch_loss = make_proposal_batch_loss(model, bs)

    def loss_and_grad(params, batch):
        (loss, parts), grads = jax.value_and_grad(
            batch_loss, has_aux=True)(params, batch)
        return loss, parts, grads

    single = jax.jit(loss_and_grad)
    loss_a, parts_a, ga = single(
        params, {k: jnp.asarray(v) for k, v in batch.items()})

    mesh = make_mesh(data=8, model=1)
    repl, data = replicated_sharding(mesh), batch_sharding(mesh)
    sharded = jax.jit(loss_and_grad, in_shardings=(repl, data),
                      out_shardings=(repl, repl, repl))
    loss_b, parts_b, gb = sharded(params, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
    for k in parts_a:
        np.testing.assert_allclose(float(parts_a[k]), float(parts_b[k]),
                                   rtol=1e-4, atol=1e-6)
    # global relative L2 of the gradient difference — the mis-sharding /
    # lost-all-reduce detector (those fail at O(1); noise is ~4e-7)
    sq = sum(float((np.asarray(a) ** 2).sum())
             for a in jax.tree_util.tree_leaves(ga))
    dsq = sum(float(((np.asarray(a) - np.asarray(b)) ** 2).sum())
              for a, b in zip(jax.tree_util.tree_leaves(ga),
                              jax.tree_util.tree_leaves(gb)))
    rel = np.sqrt(dsq) / np.sqrt(sq)
    assert rel < 1e-5, f"gradient rel L2 diff {rel}"
    assert np.isfinite(float(loss_a))


def test_sharded_step_runs_and_has_gradient_allreduce(setup):
    """The sharded train step's compiled HLO must contain a cross-device
    reduction (the gradient all-reduce XLA SPMD inserts — the batch really
    is split), and one executed step must move the params and keep the
    loss finite."""
    model, variables, batch = setup
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    tx = optax.adamw(1e-4, weight_decay=1e-5)
    opt = tx.init(params)
    mesh = make_mesh(data=8, model=1)
    sharded = make_proposal_train_step(model, tx, bs, mesh=mesh)
    placed = shard_batch(batch, mesh)
    txt = sharded.lower(params, opt, placed).compile().as_text()
    assert "all-reduce" in txt or "all_reduce" in txt

    new_params, new_opt, loss, parts = sharded(params, opt, placed)
    assert np.isfinite(float(loss))
    moved = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                for a, b in zip(jax.tree_util.tree_leaves(params),
                                jax.tree_util.tree_leaves(new_params)))
    assert moved > 1e-6, "step did not update params"
