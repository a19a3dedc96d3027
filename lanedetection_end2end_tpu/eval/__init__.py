from lanedetection_end2end_tpu.eval.lane_eval import LaneEval  # noqa: F401
from lanedetection_end2end_tpu.eval.projections import Projections  # noqa: F401
from lanedetection_end2end_tpu.eval.results import write_lsq_results  # noqa: F401
from lanedetection_end2end_tpu.eval.test_driver import test_model  # noqa: F401
