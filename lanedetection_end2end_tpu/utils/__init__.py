from lanedetection_end2end_tpu.utils.observability import (  # noqa: F401
    AverageMeter,
    Logger,
    first_run,
    mkdir_if_missing,
)
