"""lanedetection_end2end_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
end-to-end lane detection through differentiable least-squares fitting.

Re-designed from scratch for TPU hardware with the capabilities of the
reference PyTorch implementation of "End-to-end Lane Detection through
Differentiable Least-Squares Fitting" (arXiv:1902.00293):

- ERFNet segmentation backbone (encoder/decoder, dual heads)
- Differentiable weighted least-squares curve fitting in bird's-eye view
- Area / MSE / backprojection curve losses + weighted cross-entropy
- Line-type and horizon classification branches
- TuSimple benchmark evaluation
- Data-parallel training over a TPU mesh via jax.sharding / pjit

Both reference experiment trees are supported as *profiles* of one codebase:
  - "bev"  (Birds_Eye_View_Loss):   normalized BEV coords, area/MSE loss
  - "bp"   (Backprojection_Loss):   pixel coords, backprojection loss,
                                    staged pretraining, test-set inference
"""

__version__ = "0.1.0"

from lanedetection_end2end_tpu.config import (  # noqa: F401
    LaneConfig, bev_defaults, bp_defaults, train_sh_config, config_from_args)
from lanedetection_end2end_tpu.ops import (  # noqa: F401
    WLSFitter, BackprojectionLoss, area_loss, mse_params_loss,
    weighted_cross_entropy, bce_with_logits, cross_entropy_logits,
    trapezoidal_area, activation_fn)
from lanedetection_end2end_tpu.models import (  # noqa: F401
    ERFNet, LaneNet, LaneNetOutput, Classification, define_model, init_weights)
