"""Train state: one replicated pytree carrying everything the jitted step
mutates (params, BatchNorm statistics, optimizer state)."""

from __future__ import annotations

from typing import Any

import flax.struct


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def init_train_state(variables, tx) -> TrainState:
    return TrainState(params=variables["params"],
                      batch_stats=variables.get("batch_stats", {}),
                      opt_state=tx.init(variables["params"]))
