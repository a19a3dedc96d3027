from lanedetection_end2end_tpu.train.optim import (  # noqa: F401
    define_optim,
    Scheduler,
)
from lanedetection_end2end_tpu.train.state import TrainState  # noqa: F401
from lanedetection_end2end_tpu.train.steps import (  # noqa: F401
    make_train_step,
    make_eval_step,
)
from lanedetection_end2end_tpu.train.checkpoint import (  # noqa: F401
    save_checkpoint,
    load_checkpoint,
    latest_checkpoint_epoch,
)
from lanedetection_end2end_tpu.train.driver import Trainer  # noqa: F401
