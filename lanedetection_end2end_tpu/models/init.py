"""Weight initialization schemes: normal | xavier | kaiming | orthogonal.

Parity with `define_init_weights` and the four scheme appliers
(Backprojection_Loss/Networks/utils.py:484-559): conv/dense kernels get the
scheme, biases go to zero, BatchNorm scales ~ N(1, 0.02) and biases to zero.
Implemented as a pure pytree transformation over an initialized flax params
tree (the JAX analog of `model.apply(weights_init_*)`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _fans(shape):
    """fan_in/fan_out for flax kernels: conv (kh, kw, in, out) or dense (in, out)."""
    if len(shape) == 2:
        return shape[0], shape[1]
    receptive = int(np.prod(shape[:-2]))
    return shape[-2] * receptive, shape[-1] * receptive


def _init_kernel(key, shape, scheme):
    if scheme == "normal":
        return 0.02 * jax.random.normal(key, shape)
    if scheme == "xavier":
        fan_in, fan_out = _fans(shape)
        std = 0.02 * float(np.sqrt(2.0 / (fan_in + fan_out)))
        return std * jax.random.normal(key, shape)
    if scheme == "kaiming":
        fan_in, _ = _fans(shape)
        std = float(np.sqrt(2.0 / fan_in))
        return std * jax.random.normal(key, shape)
    if scheme == "orthogonal":
        flat = (int(np.prod(shape[:-1])), shape[-1])
        q = jax.nn.initializers.orthogonal(scale=1.0)(key, flat)
        return q.reshape(shape)
    raise NotImplementedError(
        f"initialization method [{scheme}] is not implemented")


def init_weights(variables, scheme: str, rng) -> dict:
    """Re-sample a flax variables dict {'params': ..., 'batch_stats': ...}."""
    params = variables["params"]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    keys = jax.random.split(rng, len(flat))
    new_leaves = []
    for key, (path, leaf) in zip(keys, flat):
        names = [p.key for p in path if hasattr(p, "key")]
        leaf_name = names[-1] if names else ""
        is_bn = any("bn" in n or "BatchNorm" in n for n in names[:-1])
        if leaf_name == "bias":
            new_leaves.append(jnp.zeros_like(leaf))
        elif is_bn and leaf_name == "scale":
            new_leaves.append(
                (1.0 + 0.02 * jax.random.normal(key, leaf.shape)).astype(leaf.dtype))
        elif leaf_name == "kernel":
            new_leaves.append(
                _init_kernel(key, leaf.shape, scheme).astype(leaf.dtype))
        elif leaf_name == "scale":  # non-BN scale (none expected)
            new_leaves.append(jnp.ones_like(leaf))
        else:
            new_leaves.append(leaf)
    new_params = jax.tree_util.tree_unflatten(treedef, new_leaves)
    out = dict(variables)
    out["params"] = new_params
    return out
