"""Feature Pyramid Network head over the ResNet backbone
(maskrcnn-benchmark backbone/fpn.py equivalent). NHWC, jit-static shapes."""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp


class FPN(nn.Module):
    """Builds P2..P6 from backbone c2..c5."""

    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        conv = lambda name: nn.Conv(self.out_channels, (1, 1), name=name,  # noqa: E731
                                    dtype=self.dtype, param_dtype=jnp.float32)
        conv3 = lambda name: nn.Conv(self.out_channels, (3, 3), name=name,  # noqa: E731
                                     dtype=self.dtype, param_dtype=jnp.float32)
        laterals = {lvl: conv(f"lateral_{lvl}")(feats[lvl].astype(self.dtype))
                    for lvl in ("c2", "c3", "c4", "c5")}
        p = {"p5": laterals["c5"]}
        for src, dst in (("c4", "p4"), ("c3", "p3"), ("c2", "p2")):
            up_name = {"p4": "p5", "p3": "p4", "p2": "p3"}[dst]
            up = jax.image.resize(p[up_name], laterals[src].shape,
                                  method="nearest")
            p[dst] = laterals[src] + up
        out = {lvl: conv3(f"post_{lvl}")(p[lvl])
               for lvl in ("p2", "p3", "p4", "p5")}
        out["p6"] = nn.max_pool(out["p5"], (1, 1), strides=(2, 2))
        return out
