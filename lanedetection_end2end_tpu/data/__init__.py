from lanedetection_end2end_tpu.data.labels import (  # noqa: F401
    mirror_list,
    read_json_lines,
    write_json_lines,
    load_valid_set_file_all,
)
from lanedetection_end2end_tpu.data.dataset import (  # noqa: F401
    LaneDataset,
    LaneTestSet,
)
from lanedetection_end2end_tpu.data.loader import (  # noqa: F401
    split_indices,
    get_loader,
    get_testloader,
    Loader,
    DevicePrefetcher,
)
from lanedetection_end2end_tpu.data.synthetic import (  # noqa: F401
    SyntheticLanes,
    make_synthetic_root,
)
