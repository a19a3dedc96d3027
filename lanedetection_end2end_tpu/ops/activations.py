"""Weight-map activations applied to the decoder output before the LSQ fit.

Mirrors `activation_layer` (Birds_Eye_View_Loss/Networks/LSQ_layer.py:43-63):
square | sigmoid | relu | softplus | abs | none. Pure jittable functions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_ACTIVATIONS = {
    "square": lambda x: x * x,
    "sigmoid": jax.nn.sigmoid,
    "relu": jax.nn.relu,
    "softplus": jax.nn.softplus,
    "abs": jnp.abs,
    "none": lambda x: x,
}


def activation_fn(name: str):
    try:
        return _ACTIVATIONS[name]
    except KeyError:
        raise NotImplementedError(
            f"Activation type: {name} is not implemented") from None
