from lanedetection_end2end_tpu.models.erfnet import ERFNet  # noqa: F401
from lanedetection_end2end_tpu.models.heads import Classification  # noqa: F401
from lanedetection_end2end_tpu.models.lanenet import LaneNet, LaneNetOutput  # noqa: F401
from lanedetection_end2end_tpu.models.registry import define_model, MODEL_REGISTRY  # noqa: F401
from lanedetection_end2end_tpu.models.init import init_weights  # noqa: F401
from lanedetection_end2end_tpu.models.port import (  # noqa: F401
    load_into_variables, port_torch_state_dict)
