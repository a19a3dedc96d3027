"""Optimizers and learning-rate schedules.

Parity with `define_optim` / `define_scheduler`
(Birds_Eye_View_Loss/Networks/utils.py:411-441):
- adam / sgd(momentum 0.9) / rmsprop(momentum 0.9), all with torch-semantics
  L2 weight decay (decay added to the RAW gradient before the optimizer
  update, like torch's `weight_decay` — NOT decoupled AdamW decay).
- lambda / step / plateau / none schedules, all EPOCH-indexed. The learning
  rate is an injected hyperparameter (`optax.inject_hyperparams`), set by the
  host between epochs — matching the reference's `scheduler.step()` placement
  (epoch start for lambda/step, main.py:174-177; epoch end on the validation
  score for plateau, main.py:303-306).
- optional global-norm gradient clipping (main.py:259-261).
"""

from __future__ import annotations

from typing import Optional

import optax


def define_optim(name: str, learning_rate: float, weight_decay: float = 0.0,
                 clip_grad_norm: float = 0.0,
                 flatten: bool = False) -> optax.GradientTransformation:
    """Build the optax chain. The learning rate is injectable:
    `opt_state.hyperparams['learning_rate']` (see `set_lr`).

    `flatten` runs the (purely elementwise) update on one concatenated
    parameter vector (bit-identical; tested). Default OFF: it was meant to
    collapse ~2300 tiny per-leaf DMAs (~1.5 ms/step), but optax.flatten's
    unflatten lowers to an f32[N,4] split running at 4/128 lane occupancy —
    2.8 ms/step on the profile, a net LOSS on TPU."""

    def core(learning_rate):
        chain = []
        if clip_grad_norm:
            chain.append(optax.clip_by_global_norm(clip_grad_norm))
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        if name == "adam":
            chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        elif name == "sgd":
            chain.append(optax.trace(decay=0.9, nesterov=False))
        elif name == "rmsprop":
            # torch RMSprop: alpha=0.99, eps=1e-8 OUTSIDE the sqrt, momentum 0.9
            chain.append(optax.scale_by_rms(decay=0.99, eps=1e-8,
                                            eps_in_sqrt=False))
            chain.append(optax.trace(decay=0.9, nesterov=False))
        else:
            raise KeyError(
                f"The requested optimizer: {name} is not implemented")
        chain.append(optax.scale(-learning_rate))
        return optax.chain(*chain)

    tx = optax.inject_hyperparams(core)(learning_rate=learning_rate)
    # clip_by_global_norm / weight decay / moment updates are all global-norm
    # or elementwise ops, so flattening is bit-identical (tested in
    # tests/test_train.py::test_flat_optimizer_matches_per_leaf).
    return optax.flatten(tx) if flatten else tx


def set_lr(opt_state, lr: float):
    """Functionally update the injected learning rate."""
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state


def get_lr(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


class Scheduler:
    """Epoch-level learning-rate schedule (host-side, stateful for plateau).

    lambda:  lr * (1 - max(0, e+1-niter)/(niter_decay+1))   (utils.py:424-428)
    step:    lr * gamma^(e // lr_decay_iters)               (utils.py:429-431)
    plateau: ReduceLROnPlateau(mode=min, factor=gamma, threshold=1e-4,
             patience=lr_decay_iters)                        (utils.py:432-436)
    none/None: constant.
    """

    def __init__(self, policy: Optional[str], base_lr: float,
                 niter: int = 50, niter_decay: int = 400, gamma: float = 0.0,
                 lr_decay_iters: int = 30):
        if policy not in (None, "none", "lambda", "step", "plateau"):
            raise NotImplementedError(
                "learning rate policy [%s] is not implemented" % policy)
        self.policy = None if policy == "none" else policy
        self.base_lr = base_lr
        self.niter = niter
        self.niter_decay = niter_decay
        self.gamma = gamma
        self.lr_decay_iters = lr_decay_iters
        # plateau state
        self._lr = base_lr
        self._best = float("inf")
        self._num_bad = 0

    def epoch_lr(self, epoch: int) -> float:
        """lr for this epoch; call at epoch START (lambda/step policies)."""
        if self.policy == "lambda":
            factor = 1.0 - max(0, epoch + 1 - self.niter) / float(
                self.niter_decay + 1)
            self._lr = self.base_lr * factor
        elif self.policy == "step":
            self._lr = self.base_lr * (
                self.gamma ** (epoch // self.lr_decay_iters))
        return self._lr

    def plateau_step(self, score: float) -> float:
        """Call at epoch END with the validation score (plateau policy)."""
        if self.policy != "plateau":
            return self._lr
        if score < self._best - 1e-4:
            self._best = score
            self._num_bad = 0
        else:
            self._num_bad += 1
            if self._num_bad > self.lr_decay_iters:
                self._lr *= self.gamma
                self._num_bad = 0
        return self._lr
