from lanedetection_end2end_tpu.ops.activations import activation_fn  # noqa: F401
from lanedetection_end2end_tpu.ops.wls import WLSFitter  # noqa: F401
from lanedetection_end2end_tpu.ops.solve import spd_solve  # noqa: F401
from lanedetection_end2end_tpu.ops.pallas_wls import wls_moments  # noqa: F401
from lanedetection_end2end_tpu.ops.pallas_nb1d import (  # noqa: F401
    nb1d_fused,
    nb1d_chain,
    pack_nb1d,
    fold_bn,
)
from lanedetection_end2end_tpu.ops.losses import (  # noqa: F401
    area_loss,
    mse_params_loss,
    weighted_cross_entropy,
    bce_with_logits,
    cross_entropy_logits,
    BackprojectionLoss,
)
from lanedetection_end2end_tpu.ops.metrics import trapezoidal_area  # noqa: F401
