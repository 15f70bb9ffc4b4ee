"""Jit'd training step + loop (SURVEY.md §4.1 rebuilt for XLA).

One `train_step` = one optimizer update on a batch of clips:
`lax.scan` over the frame axis inside the jitted step (no Python frame
loop), loss on all frames, grads through the unrolled matcher into the
backbone. The step is jit-compiled with explicit input shardings: batch
axis on the mesh "data" axis, params replicated — XLA SPMD emits the
gradient all-reduce over ICI (the NCCL-DataParallel equivalent,
SURVEY.md §3.3).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict
from jax.sharding import Mesh

from dmm_net_tpu.config import Config
from dmm_net_tpu.models.dmm import DMMNet, init_frame_state
from dmm_net_tpu.parallel.mesh import batch_sharding, replicated_sharding
from dmm_net_tpu.train.losses import clip_loss
from dmm_net_tpu.utils.hostinit import host_init


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=cfg.train.lr,
        warmup_steps=cfg.train.warmup_steps,
        decay_steps=max(cfg.train.total_steps, cfg.train.warmup_steps + 1))
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, weight_decay=cfg.train.weight_decay))
    if cfg.train.grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.train.grad_accum)
    return tx


def create_train_state(cfg: Config, rng: jax.Array,
                       sample_batch: dict,
                       mesh: Optional[Mesh] = None) -> TrainState:
    """Initialize params from one (host) sample batch.

    With a ``mesh``, the variables are placed on a replicated
    ``NamedSharding`` over it, matching ``make_train_step``'s explicit
    ``in_shardings`` — so the first step neither reshards a tree
    hard-committed to ``jax.devices()[0]`` nor trips a device-assignment
    mismatch on multi-host topologies (ADVICE r4 #2)."""
    model = DMMNet(cfg)
    frames = sample_batch["frames"]
    B, T, H, W, _ = frames.shape
    M = sample_batch["tmpl_masks"].shape[1]

    # Eager flax init runs the full un-jitted forward; on the axon relay
    # that is thousands of per-op RPCs (a measured 25-min stall). Run it
    # on the host CPU backend and ship the variables once — the forward's
    # values are discarded, only the param tree matters (utils/hostinit).
    rng_host = np.asarray(rng)
    def _init():
        state0 = init_frame_state(cfg, jnp.zeros((B, M, H, W), jnp.float32))
        return model.init(
            jnp.asarray(rng_host), np.asarray(frames[:, 0]),
            np.asarray(sample_batch["prop_masks"][:, 0]),
            np.asarray(sample_batch["prop_valid"][:, 0]),
            jnp.zeros((B, M, cfg.model.feature_dim), jnp.float32),
            np.asarray(sample_batch["tmpl_valid"]), state0)

    target = replicated_sharding(mesh) if mesh is not None else None
    variables = host_init(_init, device=target)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = make_optimizer(cfg)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=tx.init(params),
                      tx=tx, apply_fn=model.apply)


def _clip_forward(model: DMMNet, variables, batch, cfg: Config):
    """Forward a clip batch; returns (loss, logits, batch_stats).

    batch_stats is the (possibly updated) BN running-stats collection:
    with cfg.model.train_bn and a train-mode model, each frame's backbone
    pass normalizes with batch statistics and the running averages are
    threaded through the frame scan (momentum update per frame, exactly
    the torch train() semantics); otherwise the input collection is
    returned unchanged (frozen BN — the detection-lineage fine-tuning
    default, see config.py ModelConfig.train_bn).

    batch: frames (B,T,H,W,3), prop_masks (B,T,N,H,W), prop_valid (B,T,N),
    tmpl_masks (B,M,H,W), tmpl_valid (B,M), gt_masks (B,T,M,H,W).

    Mid-video objects (YT-VOS, SURVEY.md §1.6): optional batch keys
      live_from (B, M) int — clip index of each object's first annotated
        frame (its template frame); absent -> all objects live from 0;
      gt_valid (B, T, M) bool — per-frame loss mask (object live AND frame
        annotated); absent -> tmpl_valid broadcast over T.
    Template features are carried through the frame scan and pooled at
    exactly each object's live_from frame — the training analog of the
    engine's per-object template frames, at zero extra backbone passes
    (the scan computes that frame's features anyway)."""
    frames = batch["frames"]
    B, T = frames.shape[:2]
    tmpl_masks = batch["tmpl_masks"]
    tmpl_valid = batch["tmpl_valid"]
    gated = "live_from" in batch
    live_from = (jnp.asarray(batch["live_from"], jnp.int32) if gated
                 else jnp.zeros(tmpl_valid.shape, jnp.int32))

    state0 = model.apply(variables, tmpl_masks, method=DMMNet.init_state)
    tf0 = jnp.zeros(tmpl_valid.shape + (cfg.model.feature_dim,), jnp.float32)
    bn_mut = model.train and cfg.model.train_bn
    bs0 = variables.get("batch_stats", FrozenDict())

    def frame_apply(carry, frame, pmask, pvalid, t):
        st, tfeats, bs = carry
        vars_t = {"params": variables["params"], "batch_stats": bs}
        if bn_mut:
            # the backbone runs ONLY here; the other applies reuse feats,
            # so this is the single batch_stats mutation point per frame
            feats, mut = model.apply(vars_t, frame, mutable=["batch_stats"],
                                     method=DMMNet.extract_features)
            bs = jax.lax.stop_gradient(mut["batch_stats"])
        else:
            feats = model.apply(vars_t, frame,
                                method=DMMNet.extract_features)
        pooled = model.apply(vars_t, feats, tmpl_masks,
                             method=DMMNet.pool_mask_features)
        # each object's template features lock in at its own frame
        tfeats = jnp.where((live_from == t)[..., None], pooled, tfeats)
        valid_t = tmpl_valid & (t >= live_from)
        out, new_st = model.apply(vars_t, frame, pmask, pvalid,
                                  tfeats, valid_t, st, feats)
        if gated:
            # pre-live slots keep their GT template mask (the aggregation/
            # decoder feedback would wipe it before the object appears)
            live_px = valid_t[..., None, None]
            from dmm_net_tpu.infer.engine import _grid_like
            new_st = new_st._replace(template_masks=jnp.where(
                live_px, new_st.template_masks,
                _grid_like(tmpl_masks, new_st.template_masks)))
        return (new_st, tfeats, bs), out.logits

    if cfg.train.remat:
        # recompute frame activations in the backward pass: clip-BPTT
        # memory becomes O(1 frame) instead of O(T frames)
        frame_apply = jax.checkpoint(frame_apply)

    def step(carry, xs):
        frame, pmask, pvalid, t = xs
        return frame_apply(carry, frame, pmask, pvalid, t)

    xs = (jnp.moveaxis(frames, 1, 0),
          jnp.moveaxis(batch["prop_masks"], 1, 0),
          jnp.moveaxis(batch["prop_valid"], 1, 0),
          jnp.arange(T, dtype=jnp.int32))
    (_, _, bs_out), logits_t = jax.lax.scan(step, (state0, tf0, bs0), xs)
    logits = jnp.moveaxis(logits_t, 0, 1)                 # (B, T, M, H, W)
    if logits.shape[-2:] != tuple(cfg.model.image_size):
        # logits_res="mask" (inference-oriented preset used for training):
        # upsample to image resolution so the loss semantics are unchanged
        logits = jax.image.resize(
            logits, logits.shape[:-2] + tuple(cfg.model.image_size),
            method="bilinear")
    loss_valid = batch.get("gt_valid", tmpl_valid)
    loss = clip_loss(logits, batch["gt_masks"], loss_valid,
                     bce_weight=cfg.train.loss_bce_weight,
                     iou_weight=cfg.train.loss_iou_weight)
    return loss, logits, bs_out


def make_train_step(cfg: Config, mesh: Optional[Mesh] = None):
    """Build the jitted train step. With a mesh, inputs are sharded batch-
    on-"data" and state replicated (donated for in-place update)."""
    model = DMMNet(cfg, train=True)

    def train_step(state: TrainState, batch: dict):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            loss, logits, new_bs = _clip_forward(model, variables, batch, cfg)
            return loss, (logits, new_bs)

        (loss, (_, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,))


def train_loop(cfg: Config, state: TrainState, batches: Iterable[dict],
               mesh: Optional[Mesh] = None, log_every: int = 10,
               writer=None, checkpointer=None):
    """Host-side loop: stage batches to device, step, log, checkpoint."""
    step_fn = make_train_step(cfg, mesh)
    t0 = time.time()
    for i, batch in enumerate(batches):
        if mesh is not None:
            from dmm_net_tpu.parallel.mesh import shard_batch
            batch = shard_batch(batch, mesh)
        state, metrics = step_fn(state, batch)
        if (i + 1) % log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            m["steps_per_sec"] = log_every / (time.time() - t0)
            t0 = time.time()
            if writer is not None:
                writer.write(int(state.step), m)
            else:
                print(f"step {int(state.step)}: {m}")
        if checkpointer is not None and (i + 1) % cfg.train.checkpoint_every == 0:
            checkpointer.save(state)
    return state
