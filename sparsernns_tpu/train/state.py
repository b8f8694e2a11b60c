"""TrainState: params + batch_stats + pruning masks.

Reference: the TrainState-with-batch_stats subclass (train_helpers.py:83-84)
plus jaxpruner's mask state hidden inside the wrapped optimizer
(train_helpers.py:509). Here masks are a first-class field — explicit,
checkpointable, and shardable like any other pytree.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from flax import struct
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None
    masks: Any = None  # pruning masks (pytree mirroring params) or None

    def apply_gradients_with_stats(self, *, grads, batch_stats=None, **kw):
        new = self.apply_gradients(grads=grads, **kw)
        if batch_stats is not None:
            new = new.replace(batch_stats=batch_stats)
        return new


def count_params(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
