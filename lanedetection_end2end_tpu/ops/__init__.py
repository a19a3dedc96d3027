from lanedetection_end2end_tpu.ops.activations import activation_fn  # noqa: F401
from lanedetection_end2end_tpu.ops.wls import WLSFitter  # noqa: F401
from lanedetection_end2end_tpu.ops.losses import (  # noqa: F401
    area_loss,
    mse_params_loss,
    weighted_cross_entropy,
    bce_with_logits,
    cross_entropy_logits,
    BackprojectionLoss,
)
from lanedetection_end2end_tpu.ops.metrics import trapezoidal_area  # noqa: F401
