"""Configuration for the TPU-native lane-detection framework.

Mirrors the reference CLI flag-for-flag (both experiment trees):
  - BEV tree:  Birds_Eye_View_Loss/Networks/utils.py:24-92
  - BP tree:   Backprojection_Loss/Networks/utils.py:24-99
but as a typed dataclass; the CLI shim (`build_parser` / `config_from_args`)
reproduces the argparse surface, including the str2bool convention
(Backprojection_Loss/Networks/utils.py:386-392) and the `save_id` run naming
(Birds_Eye_View_Loss/main.py:48-57, Backprojection_Loss/main.py:65-77).

All mode switches (`end_to_end`, `pretrained`, `clas`, `order`, ...) are
*static* compile-time configuration in this framework: each training phase
gets its own jitted step function (one XLA graph per mode) instead of the
reference's runtime mutation of `args.end_to_end`.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from dataclasses import dataclass, field
from typing import List, Optional

# Perf env knobs: kernel-path overrides read by the ops/ modules at trace
# time. All default to the measured-best path; a set knob is appended to
# `save_id` so overridden runs are distinguishable on disk. The full
# measurement record behind each default is in PROFILE_r04/r05.md.
#   NB1D_STACK=S          serving engine: stack S images along sublanes per
#                         grid step (models/fused_graph.py::_stack_factor).
#   NB1D_WINO=1           serving engine: Winograd-H conv form — measured
#                         SLOWER on v5e (ops/pallas_nb1d.py::wino_hint);
#                         kept for other TPU generations.
#   PACKED_PALLAS=0/1     force-disable/enable the packed Pallas train
#                         graph (ops/packed_graph.py).
#   PACKED_FUSED_BLOCKS=0 disable the fused NB half-block train kernels
#                         (default on, ops/packed_graph.py::fused_blocks_on).
#   PACKED_FUSED_MAPS=0/1 override the fused lane-map kernel gate
#                         (defaults to the fused-block gate).
#   PACKED_GATHER_MAPS=1  debug: force the gather/scatter lane-map builder
#                         instead of the constant-mask einsum form.
#   PACKED_BANDED=1       opt into the banded 2-matmul W-conv form in the
#                         fused train kernels — measured 3.5% SLOWER than
#                         the default direct 3-tap form on v5e
#                         (ops/packed_graph.py::_kw_mats).
PERF_ENV_KNOBS = ("NB1D_STACK", "NB1D_WINO", "PACKED_PALLAS",
                  "PACKED_FUSED_BLOCKS", "PACKED_FUSED_MAPS",
                  "PACKED_GATHER_MAPS", "PACKED_BANDED")


def str2bool(argument: str) -> bool:
    """Boolean CLI convention (Backprojection_Loss/Networks/utils.py:386)."""
    if argument.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if argument.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Wrong argument in argparse, should be a boolean")


@dataclass(frozen=True)
class LaneConfig:
    """Every flag of the reference CLI, plus TPU-specific additions."""

    # ---- profile: which reference experiment tree's semantics to use ----
    # "bev": normalized BEV coordinates + area/MSE loss (Birds_Eye_View_Loss)
    # "bp":  pixel coordinates + backprojection loss (Backprojection_Loss)
    profile: str = "bp"

    # ---- segmentation model settings ----
    dataset: str = "lane_detection"
    batch_size: int = 8
    val_batch_size: Optional[int] = None  # BP tree only (utils.py:29)
    nepochs: int = 500  # 350 in the BEV tree
    learning_rate: float = 1e-4
    no_cuda: bool = False  # kept for CLI parity; ignored (device = TPU)
    nworkers: int = 8
    no_dropout: bool = False
    nclasses: int = 2  # choices [2, 4]
    crop_size: int = 80
    resize: int = 256  # image resized to (resize, 2*resize)
    mod: str = "erfnet"
    layers: int = 18
    pool: bool = True
    draw_testset: bool = False  # BP tree only
    pretrained: bool = False
    pretrain_epochs: int = 20
    skip_epochs: int = 10  # BP tree only (utils.py:44)
    channels_in: int = 3
    norm: str = "batch"
    flip_on: bool = False
    num_train: int = 3626  # 2535 in the BEV tree
    split_percentage: float = 0.2
    test_mode: bool = False
    start_epoch: int = 0
    evaluate: bool = False
    resume: str = ""

    # ---- optimizer settings ----
    optimizer: str = "adam"
    weight_init: str = "kaiming"
    weight_decay: float = 0.0
    lr_decay: bool = False
    niter: int = 50
    niter_decay: int = 400
    lr_policy: Optional[str] = None  # lambda | step | plateau | none
    lr_decay_iters: int = 30
    clip_grad_norm: float = 0.0

    # ---- fitting layer settings ----
    order: int = 2
    activation_layer: str = "square"
    reg_ls: float = 0.0
    no_ortho: bool = False
    mask_percentage: float = 0.3
    # CLI-parity flag, semantically INERT here: the reference offers two
    # numerically equivalent SPD solvers (`torch.inverse` vs the Cholesky
    # GELS path, Backprojection_Loss/Networks/gels.py); this framework's
    # solve is always the unrolled SPD Cholesky (ops/solve.py::spd_solve),
    # so both flag values share one code path (ops/wls.py:328-332). Kept
    # because it participates in `save_id` run naming.
    use_cholesky: bool = False
    activation_net: str = "relu"

    # ---- paths ----
    image_dir: str = ""
    gt_dir: str = ""
    test_dir: str = ""  # BP tree only
    save_path: str = "Saved/"
    json_file: str = "Labels/Curve_parameters.json"

    # ---- loss settings ----
    weight_seg: float = 30.0
    weight_class: float = 1.0
    weight_fit: float = 1.0
    loss_policy: str = "area"  # area | mse | backproject
    weight_funct: str = "none"  # none | linear | quadratic
    end_to_end: bool = True
    no_mapping: bool = False  # BP tree only (utils.py:87)
    gamma: float = 0.0
    clas: bool = False

    # ---- cudnn / tensorboard / print (parity-only flags) ----
    cudnn: bool = True
    no_tb: bool = True
    print_freq: int = 500
    save_freq: int = 100
    skip_list: List[int] = field(default_factory=lambda: [954, 2789])

    # ---- TPU-native additions (no reference counterpart) ----
    compute_dtype: str = "float32"  # float32 | bfloat16 — backbone compute
    num_devices: int = 0  # 0 = use all local devices for data parallelism
    # >1: two-level data-parallel mesh ("dcn" across slices x "data" within
    # a slice over ICI, parallel/mesh.py::make_mesh_2d) — the gradient
    # all-reduce decomposes into a fat intra-slice phase and one small
    # cross-slice phase on the data-center network. num_devices (or all
    # local devices) must divide evenly into num_slices.
    num_slices: int = 1
    prefetch: int = 2  # device prefetch depth of the input pipeline
    seed: int = 0
    # fused Pallas path for WLS moments: None = auto (on when the backend is
    # TPU), True/False = force. Plumbed to ops.wls.WLSFitter(use_pallas=...).
    use_pallas_wls: Optional[bool] = None
    # lane-packed differentiable backbone for TRAINING (ops/packed_graph.py):
    # None/False = off (default — measured slower than the flax graph under
    # XLA, see train/steps.py::_resolve_packed), True = force on. Identical
    # math to the flax graph (tests/test_packed_graph.py).
    packed_train: Optional[bool] = None
    # learned-homography option (the README's "finetuned homography"
    # configuration, README.md:93): a HomographyHead (models/dlt.py)
    # predicts per-sample trapezoid offsets and a differentiable DLT solve
    # (geometry/dlt.py) re-derives the BEV matrices end to end. 'bp'
    # profile only (pixel homography).
    learn_homography: bool = False
    # Opt-in: score the VALIDATION split with TuSimple LaneEval in the 'bp'
    # profile (the reference only ever LaneEval-scores the test set,
    # Backprojection_Loss/main.py:389-396 — a BP run without a test set
    # tracks only val loss). Produces `val_acc` in scalars.jsonl.
    val_laneeval: bool = False

    # ------------------------------------------------------------------
    def __post_init__(self):
        if self.profile not in ("bev", "bp"):
            raise ValueError(f"unknown profile {self.profile!r}")
        if self.nclasses not in (2, 4):
            raise ValueError("nclasses must be 2 or 4")
        # Cross-flag invariants enforced by the reference driver
        # (Birds_Eye_View_Loss/main.py:36-40, Backprojection_Loss/main.py:51-54)
        if not self.end_to_end and self.pretrained:
            raise ValueError("pretrained requires end_to_end")
        if self.clas and self.nclasses != 4:
            raise ValueError("classification branches require nclasses == 4")
        if self.order not in (0, 1, 2, 3):
            raise ValueError("polynomial order must be in 0..3")
        if self.profile == "bev" and self.order == 3:
            raise ValueError("order 3 is only supported by the 'bp' profile")
        if self.learn_homography and (self.profile != "bp"
                                      or self.no_mapping):
            raise ValueError("learn_homography requires the 'bp' profile "
                             "with a real (non-identity) homography")

    # ------------------------------------------------------------------
    @property
    def effective_val_batch_size(self) -> int:
        return self.val_batch_size if self.val_batch_size else self.batch_size

    @property
    def image_height(self) -> int:
        return self.resize

    @property
    def image_width(self) -> int:
        return 2 * self.resize

    @property
    def seg_out_channels(self) -> int:
        """Decoder output channels: nclasses (+1 background when seg-pretraining).

        Mirrors `out_channels = nclasses + int(not end_to_end)`
        (Birds_Eye_View_Loss/Networks/LSQ_layer.py:242).
        """
        return self.nclasses + int(not self.end_to_end)

    @property
    def save_id(self) -> str:
        """Per-run directory naming, per profile.

        BEV: Birds_Eye_View_Loss/main.py:48-57
        BP:  Backprojection_Loss/main.py:65-77

        Any non-default perf env knob (PERF_ENV_KNOBS) is appended so two
        runs that differ only in kernel-path overrides land in different
        run directories.
        """
        if self.profile == "bev":
            base = (
                "Mod_{}_opt_{}_loss_{}_lr_{}_batch_{}_end2end_{}_lanes_{}"
                "_resize_{}_pretrain{}_clas{}".format(
                    self.mod, self.optimizer, self.loss_policy,
                    self.learning_rate, self.batch_size, self.end_to_end,
                    self.nclasses, self.resize, self.pretrained, self.clas))
        else:
            base = (
                "Mod_{}_opt_{}_loss_{}_lr_{}_batch_{}_end2end_{}_chol_{}"
                "_lanes_{}_pretrain{}_clas{}_mask{}_flip_on{}_activation_{}"
                .format(
                    self.mod, self.optimizer, self.loss_policy,
                    self.learning_rate, self.batch_size, self.end_to_end,
                    self.use_cholesky, self.nclasses, self.pretrained,
                    self.clas, self.mask_percentage, self.flip_on,
                    self.activation_layer))
        knobs = "".join(f"_{k}{os.environ[k]}" for k in PERF_ENV_KNOBS
                        if os.environ.get(k) not in (None, ""))
        return base + knobs

    def replace(self, **kw) -> "LaneConfig":
        return dataclasses.replace(self, **kw)

    # -- phase logic of the staged pretraining schedule -----------------
    # (Backprojection_Loss/main.py:32-44 `get_flags`,
    #  Birds_Eye_View_Loss/main.py:179-184)
    def phase_for_epoch(self, epoch: int) -> str:
        """Returns 'skip' | 'seg' | 'e2e' for a given epoch."""
        if self.pretrained:
            if epoch < self.pretrain_epochs:
                if self.profile == "bp" and epoch < self.skip_epochs:
                    return "skip"
                return "seg"
            return "e2e"
        return "e2e" if self.end_to_end else "seg"


def bev_defaults(**kw) -> LaneConfig:
    """Defaults of the Birds_Eye_View_Loss tree CLI."""
    base = dict(profile="bev", nepochs=350, num_train=2535, save_freq=500,
                test_dir="")
    base.update(kw)
    return LaneConfig(**base)


def bp_defaults(**kw) -> LaneConfig:
    """Defaults of the Backprojection_Loss tree CLI."""
    base = dict(profile="bp", nepochs=500, num_train=3626, save_freq=100)
    base.update(kw)
    return LaneConfig(**base)


def train_sh_config(**kw) -> LaneConfig:
    """The canonical full-feature multi-lane configuration.

    Mirrors Backprojection_Loss/train.sh: `--loss_policy backproject
    --nclasses 4 --order 3 --clas 1 --pretrained false
    --mask_percentage 0.20 ...` — the config behind the published
    93.2%/95.8% TuSimple accuracies (README.md:93-94).
    """
    base = dict(profile="bp", loss_policy="backproject", nclasses=4, order=3,
                clas=True, pretrained=False, mask_percentage=0.20,
                flip_on=True, num_train=3626, end_to_end=True)
    base.update(kw)
    return LaneConfig(**base)


# ----------------------------------------------------------------------
# CLI shim
# ----------------------------------------------------------------------

_BOOL_STR_FLAGS = {  # flags that use the str2bool convention in the reference
    "pool", "draw_testset", "pretrained", "flip_on", "use_cholesky",
    "end_to_end", "no_mapping", "clas", "cudnn", "no_tb", "use_pallas_wls",
    "packed_train", "learn_homography", "val_laneeval",
}
_STORE_TRUE_FLAGS = {
    "no_cuda", "no_dropout", "test_mode", "evaluate", "lr_decay", "no_ortho",
}


def build_parser(profile: str = "bp") -> argparse.ArgumentParser:
    """argparse parser mirroring the reference `define_args`."""
    defaults = bev_defaults() if profile == "bev" else bp_defaults()
    parser = argparse.ArgumentParser(description="Lane_detection_all_objectives")
    parser.add_argument("--profile", type=str, default=profile,
                        choices=["bev", "bp"])
    for f in dataclasses.fields(LaneConfig):
        if f.name in ("profile", "skip_list"):
            continue
        flag = "--" + f.name
        default = getattr(defaults, f.name)
        if f.name in _BOOL_STR_FLAGS:
            parser.add_argument(flag, type=str2bool, nargs="?", const=True,
                                default=default)
        elif f.name in _STORE_TRUE_FLAGS:
            parser.add_argument(flag, action="store_true", default=default)
        elif f.name == "val_batch_size":
            parser.add_argument(flag, type=int, default=None)
        elif f.name == "lr_policy":
            parser.add_argument(flag, type=str, default=default)
        else:
            parser.add_argument(flag, type=type(default) if default is not None
                                else str, default=default)
    parser.add_argument("--list", dest="skip_list", type=int, nargs="+",
                        default=[954, 2789],
                        help="Images you want to skip")
    return parser


def config_from_args(argv=None, profile: str = "bp") -> LaneConfig:
    parser = build_parser(profile)
    ns = parser.parse_args(argv)
    kw = vars(ns)
    prof = kw.pop("profile")
    base = bev_defaults() if prof == "bev" else bp_defaults()
    merged = dataclasses.asdict(base)
    merged.update({k: v for k, v in kw.items() if v is not None or k == "lr_policy"})
    merged["val_batch_size"] = kw.get("val_batch_size")
    merged["profile"] = prof
    return LaneConfig(**merged)
