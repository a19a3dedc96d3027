"""Differentiable weighted least-squares polynomial fitting, TPU-first.

The reference solves, per lane k, the normal equations of a weighted fit
x = Y @ beta with diag-weight W_k over all H*W pixels
(Birds_Eye_View_Loss/Networks/LSQ_layer.py:90-167,
Backprojection_Loss/Networks/LSQ_layer.py:72-154):

    Y0 = W_k * Y;   Z = Y0^T Y0 + reg_ls*I;   beta_k = Z^{-1} (Y0^T (W_k * x))

i.e. Z = Y^T diag(W_k^2) Y and rhs = Y^T diag(W_k^2) x — only W^2 enters.

TPU redesign (this module):

1. The BEV grid is a compile-time constant (the homography never changes), so
   the per-pixel monomial products Y_i*Y_j and Y_i*x are precomputed ONCE on
   the host into a single "moment basis" B of shape (H*W, K) with
   K = (order+1)^2 + (order+1). All per-lane, per-image moments then come from
   ONE large MXU matmul:  moments = W2 @ B  with W2 = weights^2 reshaped
   (batch*nclasses, H*W). No per-lane Python loop, no (B,N,order+1)
   intermediates in HBM, no batched `bmm` against constant operands.

2. The tiny (order+1)x(order+1) solves are batched with
   `jnp.linalg.solve` / Cholesky — natively differentiable in JAX (the
   reference needed a hand-written autograd Function,
   Backprojection_Loss/Networks/gels.py:9-25).

3. Conditioning: the reference computes the normal equations on raw pixel
   coordinates (y up to 255, order 3 => Z entries ~ y^6) and leans on float64
   casts. TPUs want float32, so the Vandermonde basis is built on y/scale
   with the EXACT algebraic rescaling of both the Tikhonov term and the
   solution (beta = beta_scaled / scale^power). Same mathematical answer,
   well-conditioned in f32.

4. Totality: XLA cannot throw on singular matrices, so the solve is total —
   `reg_floor` adds a tiny diagonal relative to trace(Z) ON TOP of the
   user-facing `reg_ls`, replacing the reference's try/except batch skipping
   (Birds_Eye_View_Loss/main.py:213-219) and making every phase safe.

5. Separable fast path: both reference homographies map image rows to rows
   (M[1,0] = M[2,0] = 0 — the reference itself relies on this, computing
   y' from y alone at Backprojection_Loss/Loss_crit.py:175). Then the BEV y
   is constant along each row and the BEV x is LINEAR in the pixel column,
   so every moment factorizes over rows:

       Z[i,j] = sum_r Y_i(r) Y_j(r) * S0[r]
       rhs[i] = sum_r Y_i(r) * (alpha[r] S1[r] + gamma[r] S0[r])

   with S0[r] = sum_c w^2[r,c], S1[r] = sum_c w^2[r,c] * xs[c]. The whole
   contraction collapses to ONE fused streaming pass over the weight maps
   (two W-axis reductions, VPU/memory-bound) plus a (BC, 2H) x (2H, K)
   matmul on negligible data — instead of a (BC, H*W) x (H*W, K) matmul
   whose huge-K/tiny-MN shape the MXU executes at ~1% utilization. For
   general (non row-aligned) homographies the Pallas streaming kernel
   (ops/pallas_wls.py) or the plain XLA matmul handles the full grid.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from lanedetection_end2end_tpu.geometry import projective_grid
from lanedetection_end2end_tpu.ops.pallas_wls import wls_moments
from lanedetection_end2end_tpu.ops.solve import spd_solve


def _vandermonde(y: np.ndarray, order: int) -> np.ndarray:
    """Columns [y^order, ..., y, 1], matching the reference's column order
    (Birds_Eye_View_Loss/Networks/LSQ_layer.py:110-115)."""
    return np.stack([y ** p for p in range(order, -1, -1)], axis=-1)


class WLSFitter:
    """Precomputes the constant moment basis and exposes a jittable fit.

    Args:
      M: 3x3 homography (image -> BEV), host array.
      height/width: weight-map spatial shape.
      order: polynomial order (0..3).
      normalized: True for the BEV profile (grid in [0,1)), False for the BP
        profile (pixel coordinates).
      reg_ls: Tikhonov strength in the reference's unscaled coordinates
        (utils.py flag --reg_ls).
      reg_floor: relative diagonal floor making the solve total (TPU addition).
      use_cholesky: solve via Cholesky (parity with --use_cholesky / GELS).
    """

    def __init__(self, M: np.ndarray, height: int, width: int, order: int,
                 normalized: bool, reg_ls: float = 0.0,
                 reg_floor: float = 1e-8, use_cholesky: bool = False,
                 dtype=jnp.float32, use_pallas: bool | None = None,
                 pallas_interpret: bool = False):
        if order not in (0, 1, 2, 3):
            raise NotImplementedError(
                f"Requested order {order} for polynomial fit is not implemented")
        self.order = order
        self.height, self.width = height, width
        self.use_cholesky = use_cholesky
        self.reg_ls = float(reg_ls)
        self.reg_floor = float(reg_floor)
        self.dtype = dtype
        # Pallas streaming-moments kernel: default on TPU (the XLA schedule
        # for this (tiny M/N, huge K) contraction is ~50x slower there).
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        self.pallas_interpret = pallas_interpret

        grid = projective_grid(M, height, width, normalized)  # (N, 2) f64
        x_map = grid[:, 0]
        # Reference flips y so the fit runs bottom-up: 1-y (BEV, normalized,
        # LSQ_layer.py:109) or (resize-1)-y (BP pixel space, hard-coded 255
        # at Backprojection_Loss/Networks/LSQ_layer.py:94).
        y_map = (1.0 - grid[:, 1]) if normalized else (float(height - 1) - grid[:, 1])

        # Scaled Vandermonde for f32 conditioning. beta = beta_scaled / scale^p.
        scale = max(float(np.max(np.abs(y_map))), 1e-12)
        if normalized:
            scale = 1.0  # already O(1); keep bit-parity with reference math
        self.y_scale = scale
        powers = np.arange(order, -1, -1, dtype=np.float64)  # [o, ..., 1, 0]
        self._unscale = (scale ** -powers)  # multiply beta_scaled by this
        Y = _vandermonde(y_map / scale, order)  # (N, o+1)

        o1 = order + 1
        # Moment basis: all products Y_i*Y_j (row-major (o+1)^2) then Y_i*x.
        prods = (Y[:, :, None] * Y[:, None, :]).reshape(-1, o1 * o1)
        rhs = Y * x_map[:, None]
        basis = np.concatenate([prods, rhs], axis=1)  # (N, K)
        self.basis = jnp.asarray(basis, dtype=dtype)
        self.n_coeff = o1

        # -- separable row-factorized path (module docstring, point 5) ----
        M = np.asarray(M, dtype=np.float64)
        self.separable = abs(M[1, 0]) < 1e-12 and abs(M[2, 0]) < 1e-12
        if self.separable:
            if normalized:
                xs = np.linspace(0.0, 1.0 - 1.0 / width, width)
                ys = np.linspace(0.0, 1.0 - 1.0 / height, height)
            else:
                xs = np.arange(width, dtype=np.float64)
                ys = np.arange(height, dtype=np.float64)
            D = M[2, 1] * ys + M[2, 2]                    # (H,)
            alpha = M[0, 0] / D                           # x' = alpha*xs+gamma
            gamma = (M[0, 1] * ys + M[0, 2]) / D
            # Center/normalize the column coordinate: S1 = sum w^2*(xs-x0)/sx
            # stays balanced around 0, avoiding f32 cancellation between the
            # alpha- and gamma-contractions for pixel-scale coordinates.
            x0 = float(xs.mean())
            sx = max(float(np.abs(xs - x0).max()), 1e-12)
            y_rows = (M[1, 1] * ys + M[1, 2]) / D
            y_rows = (1.0 - y_rows) if normalized else (
                float(height - 1) - y_rows)
            Yr = _vandermonde(y_rows / scale, order)      # (H, o1)
            # coeff rows: [S0-block (H, K); S1-block (H, K)]
            c0 = np.concatenate(
                [(Yr[:, :, None] * Yr[:, None, :]).reshape(height, o1 * o1),
                 Yr * (gamma + alpha * x0)[:, None]], axis=1)
            c1 = np.concatenate(
                [np.zeros((height, o1 * o1)), Yr * (alpha * sx)[:, None]],
                axis=1)
            self._sep_coeff = jnp.asarray(
                np.concatenate([c0, c1], axis=0), dtype=dtype)  # (2H, K)
            self._sep_xs = jnp.asarray((xs - x0) / sx, dtype=dtype)
            # constants for the per-sample-homography path (fit_with_M)
            self._sep_ys = jnp.asarray(ys, dtype=jnp.float32)
            self._sep_x0, self._sep_sx = x0, sx
            self._normalized = normalized
        # reg_ls acts on the UNSCALED Z; in scaled coords it becomes a
        # diagonal of reg_ls * scale^(-2p) (see module docstring, point 3).
        self._reg_diag = jnp.asarray(self.reg_ls * scale ** (-2.0 * powers),
                                     dtype=dtype)

    # ------------------------------------------------------------------
    def __call__(self, wmaps: jax.Array, layout: str = "nchw") -> jax.Array:
        """Fit all lanes of all images at once.

        Args:
          wmaps: activated weight maps — (B, C, H, W) / (B, C, N) with
            layout='nchw', or (B, H, W, C) with layout='nhwc'. The NHWC form
            is the TPU-native one: the separable path reduces over W straight
            from the backbone's channels-last output, skipping the C-minor
            transpose (a pathological relayout on TPU — measured ~1 ms/batch
            at 8x4x256x512, more than the entire ERFNet forward).
        Returns:
          beta: (B, C, order+1) polynomial coefficients, highest power first
            (same layout as the reference's beta0..beta3 stacked over C).
        """
        o1 = self.n_coeff
        if layout == "nhwc":
            B, C = wmaps.shape[0], wmaps.shape[-1]
            if not self.separable:
                wmaps = jnp.transpose(wmaps, (0, 3, 1, 2))
        else:
            B, C = wmaps.shape[0], wmaps.shape[1]
        if self.separable:
            w2 = (wmaps * wmaps).astype(self.dtype)
            if layout == "nhwc":
                # (B, H, W, C): reduce W on axis 2; tiny (B,H,C) results
                xs = self._sep_xs[None, None, :, None]
                S0 = jnp.sum(w2, axis=2)                     # (B, H, C)
                S1 = jnp.sum(w2 * xs, axis=2)
                S0 = jnp.transpose(S0, (0, 2, 1))            # (B, C, H)
                S1 = jnp.transpose(S1, (0, 2, 1))
            else:
                w2 = w2.reshape(B * C, self.height, self.width)
                S0 = jnp.sum(w2, axis=-1)
                S1 = jnp.sum(w2 * self._sep_xs[None, None, :], axis=-1)
            S = jnp.concatenate(
                [S0.reshape(B * C, -1), S1.reshape(B * C, -1)], axis=-1)
            moments = jax.lax.dot_general(
                S, self._sep_coeff,
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
        elif self.use_pallas:
            w = wmaps.reshape(B * C, -1).astype(self.dtype)
            # streaming fused square+contract kernel (ops/pallas_wls.py)
            moments = wls_moments(w, self.basis,
                                  interpret=self.pallas_interpret)
        else:
            w = wmaps.reshape(B * C, -1).astype(self.dtype)
            # ONE large matmul on the MXU; highest precision — the reduction
            # over H*W pixels is the numerically critical step.
            moments = jax.lax.dot_general(
                w * w, self.basis,
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # (B*C, K)
        return self._finish(moments, B, C)

    # ------------------------------------------------------------------
    def beta_from_rowsums(self, S0: jax.Array, S1: jax.Array) -> jax.Array:
        """Fit from precomputed (already masked) W-axis row sums.

        Args:
          S0: (B, C, H) sums of w^2 per row; S1: same with the normalized
            column coordinate folded in (the outputs of the fused decoder
            kernel, models/fused_graph.py).
        Returns: (B, C, order+1) coefficients.
        """
        assert self.separable, "row-sum fitting needs a row-aligned homography"
        B, C = S0.shape[0], S0.shape[1]
        S = jnp.concatenate([S0.reshape(B * C, -1), S1.reshape(B * C, -1)],
                            axis=-1)
        moments = jax.lax.dot_general(
            S.astype(self.dtype), self._sep_coeff,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        return self._finish(moments, B, C)

    # ------------------------------------------------------------------
    def sep_coeff_from_M(self, M_b: jax.Array) -> jax.Array:
        """Per-sample separable coefficient rows (B, 2H, K) from (B, 3, 3)
        homographies of the row-separable form (M[1,0] = M[2,0] = 0,
        geometry/dlt.py). The jittable, differentiable twin of the host
        precomputation in __init__: only these tiny (B, H, order+1) tensors
        depend on the learned matrix — the heavy W-axis image reductions
        stay homography-independent."""
        assert self.separable, "per-sample fitting needs separable form"
        M_b = M_b.astype(jnp.float32)
        ys = self._sep_ys[None, :]                       # (1, H)
        D = M_b[:, 2, 1:2] * ys + M_b[:, 2, 2:3]         # (B, H)
        alpha = M_b[:, 0, 0:1] / D
        gamma = (M_b[:, 0, 1:2] * ys + M_b[:, 0, 2:3]) / D
        y_rows = (M_b[:, 1, 1:2] * ys + M_b[:, 1, 2:3]) / D
        y_rows = (1.0 - y_rows) if self._normalized else (
            float(self.height - 1) - y_rows)
        t = y_rows / self.y_scale
        o1 = self.n_coeff
        Yr = jnp.stack([t ** p for p in range(self.order, -1, -1)],
                       axis=-1)                          # (B, H, o1)
        prods = (Yr[..., :, None] * Yr[..., None, :]).reshape(
            *Yr.shape[:2], o1 * o1)
        c0 = jnp.concatenate(
            [prods, Yr * (gamma + alpha * self._sep_x0)[..., None]], axis=-1)
        c1 = jnp.concatenate(
            [jnp.zeros_like(prods), Yr * (alpha * self._sep_sx)[..., None]],
            axis=-1)
        return jnp.concatenate([c0, c1], axis=1)         # (B, 2H, K)

    def fit_with_M(self, wmaps: jax.Array, M_b: jax.Array,
                   layout: str = "nhwc") -> jax.Array:
        """Fit with PER-SAMPLE homographies (learned-homography option).

        Args:
          wmaps: weight maps, (B, H, W, C) for layout='nhwc' or (B, C, H, W).
          M_b: (B, 3, 3) row-separable homographies (geometry/dlt.py).
        Returns: (B, C, order+1) coefficients; gradients flow to both wmaps
          and M_b (the finetuned-homography training signal).
        """
        assert self.separable, "per-sample fitting needs separable form"
        if layout == "nhwc":
            B, C = wmaps.shape[0], wmaps.shape[-1]
            w2 = (wmaps * wmaps).astype(self.dtype)
            xs = self._sep_xs[None, None, :, None]
            S0 = jnp.transpose(jnp.sum(w2, axis=2), (0, 2, 1))      # (B,C,H)
            S1 = jnp.transpose(jnp.sum(w2 * xs, axis=2), (0, 2, 1))
        else:
            B, C = wmaps.shape[0], wmaps.shape[1]
            w2 = (wmaps * wmaps).astype(self.dtype)
            w2 = w2.reshape(B, C, self.height, self.width)
            S0 = jnp.sum(w2, axis=-1)
            S1 = jnp.sum(w2 * self._sep_xs[None, None, None, :], axis=-1)
        S = jnp.concatenate([S0, S1], axis=-1)           # (B, C, 2H)
        coeff = self.sep_coeff_from_M(M_b)               # (B, 2H, K)
        moments = jnp.einsum("bch,bhk->bck", S.astype(jnp.float32), coeff,
                             precision=jax.lax.Precision.HIGHEST)
        return self._finish(moments.reshape(B * C, -1), B, C)

    # ------------------------------------------------------------------
    def _finish(self, moments: jax.Array, B: int, C: int) -> jax.Array:
        """Regularize + solve + unscale the fitted coefficients."""
        o1 = self.n_coeff
        Z = moments[:, :o1 * o1].reshape(B * C, o1, o1)
        X = moments[:, o1 * o1:]

        # Total solve: user Tikhonov (exact reference semantics) + tiny
        # relative floor so absent lanes (all-zero weights) stay finite.
        trace = jnp.trace(Z, axis1=-2, axis2=-1)[:, None]
        floor = self.reg_floor * (trace / o1) + jnp.finfo(jnp.float32).tiny
        diag = self._reg_diag[None, :] + floor  # (B*C, o1)
        Z = Z + jnp.eye(o1, dtype=jnp.float32)[None] * diag[:, None, :]

        # Z is SPD by construction; the unrolled Cholesky (ops/solve.py) is
        # microseconds where batched LU costs milliseconds on TPU, and it IS
        # the --use_cholesky path of the reference (gels.py) — both flag
        # settings share it.
        beta_s = spd_solve(Z, X)

        beta = beta_s * jnp.asarray(self._unscale, dtype=beta_s.dtype)[None, :]
        return beta.reshape(B, C, o1)
