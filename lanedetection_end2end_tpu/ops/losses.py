"""Loss functions: area / MSE / backprojection curve losses, weighted CE,
BCE-with-logits. All pure jittable functions with static configuration.

Reference: Birds_Eye_View_Loss/Loss_crit.py and Backprojection_Loss/Loss_crit.py.
Absent-lane masking is `where`-based (total functions) instead of the
reference's boolean `masked_select` (data-dependent shapes are not XLA-able).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from lanedetection_end2end_tpu.geometry import bev_matrices_pixel


# ----------------------------------------------------------------------
# Curve-parameter losses (BEV space)
# ----------------------------------------------------------------------

def area_loss(params: jax.Array, gt_params: jax.Array, order: int = 2,
              weight_funct: str = "none", t: float = 0.7) -> jax.Array:
    """Squared-area-between-curves loss, closed form.

    int_0^t W(y) * (x_pred(y) - x_gt(y))^2 dy with W in {1, 1-y, 1-sqrt(y)},
    masked over absent lanes (gt all-zero) and averaged over present ones.
    Mirrors Area_Loss (Birds_Eye_View_Loss/Loss_crit.py:78-134) including the
    "0 when no lane present" behavior (:133).

    Args:
      params: (B, order+1) predicted coefficients, highest power first.
      gt_params: (B, order+1) ground-truth coefficients.
    """
    diff = params.reshape(gt_params.shape) - gt_params
    a = diff[:, 0]
    b = diff[:, 1]
    if order == 2:
        c = diff[:, 2]
        if weight_funct == "none":
            loss_fit = (a**2)*(t**5)/5 + 2*a*b*(t**4)/4 + \
                       (b**2 + c*2*a)*(t**3)/3 + 2*b*c*(t**2)/2 + (c**2)*t
        elif weight_funct == "linear":
            loss_fit = c**2*t - t**5*((2*a*b)/5 - a**2/5) + \
                       t**2*(b*c - c**2/2) - (a**2*t**6)/6 - \
                       t**4*(b**2/4 - (a*b)/2 + (a*c)/2) + \
                       t**3*(b**2/3 - (2*c*b)/3 + (2*a*c)/3)
        elif weight_funct == "quadratic":
            loss_fit = t**3*(1/3*b**2 + 2/3*a*c) - \
                       t**(7/2)*(2/7*b**2 + 4/7*a*c) + \
                       c**2*t + 0.2*a**2*t**5 - 2/11*a**2*t**(11/2) - \
                       2/3*c**2*t**(3/2) + 0.5*a*b*t**4 - \
                       4/9*a*b*t**(9/2) + b*c*t**2 - 0.8*b*c*t**(5/2)
        else:
            raise NotImplementedError(
                "The requested weight function is not implemented")
    elif order == 1:
        loss_fit = (b**2)*t + a*b*(t**2) + ((a**2)*(t**3))/3
    else:
        raise NotImplementedError("The requested order is not implemented")

    # Lane present iff no gt coefficient is exactly 0 (Loss_crit.py:131).
    mask = jnp.all(gt_params != 0, axis=1)
    n = jnp.sum(mask)
    total = jnp.sum(jnp.where(mask, loss_fit, 0.0))
    return jnp.where(n > 0, total / jnp.maximum(n, 1), 0.0)


def mse_params_loss(params: jax.Array, gt_params: jax.Array) -> jax.Array:
    """Plain MSE on curve parameters (Birds_Eye_View_Loss/Loss_crit.py:137-150)."""
    diff = params.reshape(gt_params.shape) - gt_params
    return jnp.mean(diff * diff)


# ----------------------------------------------------------------------
# Backprojection loss (BP profile)
# ----------------------------------------------------------------------

class BackprojectionLoss:
    """MSE on x-coordinates backprojected to the original image perspective.

    Precomputes (host, float64) the 56 TuSimple sampling heights, their BEV
    images under the pixel homography, and the Vandermonde rows — exactly the
    constants of Backprojection_Loss/Loss_crit.py:166-200 — then evaluates the
    masked MSE of Loss_crit.py:202-218 as a total jittable function.
    """

    def __init__(self, resize: int = 256, order: int = 3,
                 no_mapping: bool = False, dtype=jnp.float32):
        if order not in (0, 1, 2, 3):
            raise NotImplementedError(
                f"Requested order {order} for polynomial fit is not implemented")
        M, M_inv = bev_matrices_pixel(resize, no_mapping)
        start, delta = 160, 10
        # Original-image heights 160,170,...,710 mapped into the resized crop:
        # y_d = (h - 80) / 2.5 (Loss_crit.py:173).
        y_d = (np.arange(start, 720, delta, dtype=np.float64) - 80.0) / 2.5
        n_h = y_d.shape[0]  # 56
        y_prime = (M[1, 1] * y_d + M[1, 2]) / (M[2, 1] * y_d + M[2, 2])
        y_eval = (resize - 1.0) - y_prime  # 255 - y' for resize=256 (:176)
        cols = [y_eval ** p for p in range(order, 0, -1)] + [np.ones(n_h)]
        Y = np.stack(cols, axis=1)  # (56, order+1)

        self.num_heights = n_h
        self.Y = jnp.asarray(Y, dtype=dtype)
        self.y_prime = jnp.asarray(y_prime, dtype=dtype)
        self.M_inv = jnp.asarray(M_inv, dtype=dtype)
        self.order = order
        self.resize = resize
        self._y_d = jnp.asarray(y_d, dtype=jnp.float32)  # (56,)

    def __call__(self, params: jax.Array, x_gt: jax.Array,
                 valid_samples: jax.Array):
        """Args:
          params: (B, order+1) BEV polynomial coefficients.
          x_gt: (B, 56) ground-truth x at the sampling heights (resized coords).
          valid_samples: (B, 56) 0/1 validity mask.
        Returns:
          (loss scalar, x_cal * valid of shape (B, 56)) — mirroring the
          reference's return pair (Loss_crit.py:218).
        """
        # HIGHEST precision: y_eval^3 reaches ~1.4e9, so the default bf16 MXU
        # pass would quantize the Vandermonde rows to ~±5e6 — several pixels
        # of x error. Full-f32 accumulation keeps x_cal sub-pixel accurate.
        x_prime = jnp.matmul(params, self.Y.T.astype(params.dtype),
                             precision=jax.lax.Precision.HIGHEST)  # (B, 56)
        Mi = self.M_inv.astype(x_prime.dtype)
        yp = self.y_prime.astype(x_prime.dtype)[None, :]
        denom = Mi[2, 0] * x_prime + Mi[2, 1] * yp + Mi[2, 2]
        x_cal = (Mi[0, 0] * x_prime + Mi[0, 1] * yp + Mi[0, 2]) / denom
        valid = valid_samples.astype(x_cal.dtype)
        x_err = (x_gt.astype(x_cal.dtype) - x_cal) * valid
        count = jnp.sum(valid)
        loss = jnp.where(count > 0, jnp.sum(x_err * x_err) / jnp.maximum(count, 1.0), 0.0)
        return loss, x_cal * valid

    def with_M(self, params: jax.Array, x_gt: jax.Array,
               valid_samples: jax.Array, M_b: jax.Array,
               M_inv_b: jax.Array):
        """PER-SAMPLE-homography variant for the learned-homography option
        (geometry/dlt.py): the sampling heights' BEV images and the
        backprojection both use each sample's own matrices, so gradients
        flow into the homography head through the loss geometry as well as
        through the fit.

        Args: as __call__, plus M_b/M_inv_b (B, 3, 3).
        """
        M_b = M_b.astype(jnp.float32)
        Mi = M_inv_b.astype(jnp.float32)
        y_d = self._y_d[None, :]                                  # (1, 56)
        y_prime = ((M_b[:, 1, 1:2] * y_d + M_b[:, 1, 2:3])
                   / (M_b[:, 2, 1:2] * y_d + M_b[:, 2, 2:3]))     # (B, 56)
        y_eval = (self.resize - 1.0) - y_prime
        Yb = jnp.stack([y_eval ** p for p in range(self.order, 0, -1)]
                       + [jnp.ones_like(y_eval)], axis=-1)        # (B, 56, o1)
        x_prime = jnp.einsum("bp,bhp->bh", params.astype(jnp.float32), Yb,
                             precision=jax.lax.Precision.HIGHEST)
        denom = (Mi[:, 2, 0:1] * x_prime + Mi[:, 2, 1:2] * y_prime
                 + Mi[:, 2, 2:3])
        x_cal = (Mi[:, 0, 0:1] * x_prime + Mi[:, 0, 1:2] * y_prime
                 + Mi[:, 0, 2:3]) / denom
        valid = valid_samples.astype(x_cal.dtype)
        x_err = (x_gt.astype(x_cal.dtype) - x_cal) * valid
        count = jnp.sum(valid)
        loss = jnp.where(count > 0,
                         jnp.sum(x_err * x_err) / jnp.maximum(count, 1.0),
                         0.0)
        return loss, x_cal * valid


# ----------------------------------------------------------------------
# Classification losses
# ----------------------------------------------------------------------

def weighted_cross_entropy(logits: jax.Array, targets: jax.Array,
                           class_weights: jax.Array) -> jax.Array:
    """Per-pixel weighted cross entropy over NHWC logits.

    Torch-semantics weighted NLLLoss mean: sum(w[t]*nll) / sum(w[t])
    (Birds_Eye_View_Loss/Loss_crit.py:61-75 and the nn.CrossEntropyLoss with
    weights [1] + [weight_seg]*nclasses at Backprojection_Loss/Loss_crit.py:64-65).

    Args:
      logits: (B, H, W, n_cls).
      targets: (B, H, W) int class indices.
      class_weights: (n_cls,).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    w = class_weights.astype(logits.dtype)[targets]
    return jnp.sum(w * nll) / jnp.sum(w)


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """nn.BCEWithLogitsLoss (mean) — horizon / BP line-presence heads."""
    targets = targets.astype(logits.dtype)
    # log-sum-exp stable form
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(loss)


def cross_entropy_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """nn.CrossEntropyLoss over class axis 1 with trailing dims — the BEV
    line-type head: logits (B, 3, 4) vs targets (B, 4)
    (Birds_Eye_View_Loss/main.py:88,252)."""
    logp = jax.nn.log_softmax(logits, axis=1)
    nll = -jnp.take_along_axis(logp, targets[:, None, :], axis=1)[:, 0, :]
    return jnp.mean(nll)
