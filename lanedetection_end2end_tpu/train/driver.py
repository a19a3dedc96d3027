"""Training driver: the `main()` epoch loop of both reference trees as one
reusable Trainer.

Parity map (BEV = Birds_Eye_View_Loss/main.py, BP = Backprojection_Loss/main.py):
- staged pretraining schedule (BEV :179-184, BP get_flags :32-44) — static
  phases 'skip'/'seg'/'e2e', one compiled step per phase over shared state;
- per-epoch validation with metric meters and fitted-curve JSON emission
  (BEV validate :362-500) — fixed: the reference re-opens the records file in
  'w' mode per batch, keeping only the LAST batch (:458); we write all;
- LaneEval scoring: BEV scores the validation set via write_lsq_results
  (:484-488); BP scores the TuSimple TEST set per epoch when --clas
  (:389-396);
- best-model policy: BEV keeps the MINIMUM exact-area score (:334-350), BP
  the MAXIMUM test accuracy (:406-409);
- rolling checkpoint + first_run marker + resume (:122-143, :504-519);
- lr schedules: lambda/step at epoch start (:174-177), plateau on the epoch
  score (:303-306);
- Logger tee, AverageMeters, parameter-count print (:162-168).

TPU-native: batches stream through DevicePrefetcher onto the mesh's data
axis; the train step is one jitted graph whose gradient all-reduce XLA
derives from the shardings (parallel/mesh.py).
"""

from __future__ import annotations

import os
import sys
import time
from typing import Dict, Iterable, Optional

import numpy as np
import jax

from lanedetection_end2end_tpu.config import LaneConfig
from lanedetection_end2end_tpu.data.labels import write_json_lines
from lanedetection_end2end_tpu.data.loader import DevicePrefetcher
from lanedetection_end2end_tpu.eval import LaneEval, write_lsq_results
from lanedetection_end2end_tpu.eval.test_driver import test_model
from lanedetection_end2end_tpu.models import LaneNet, init_weights
from lanedetection_end2end_tpu.parallel import (
    make_mesh, make_mesh_2d, batch_sharding, replicate)
from lanedetection_end2end_tpu.train.checkpoint import (
    latest_checkpoint_epoch, load_checkpoint, save_checkpoint, _ckpt_path)
from lanedetection_end2end_tpu.train.optim import (
    Scheduler, define_optim, get_lr, set_lr)
from lanedetection_end2end_tpu.train.state import init_train_state
from lanedetection_end2end_tpu.train.steps import (
    make_eval_step, make_train_step)
from lanedetection_end2end_tpu.train.visualize import (
    save_pretrain_panel, save_weightmap)
from lanedetection_end2end_tpu.utils import AverageMeter, Logger, \
    mkdir_if_missing


class Trainer:
    """Owns model/state/steps and runs the epoch loop."""

    def __init__(self, cfg: LaneConfig, use_mesh: bool = True,
                 log_to_file: bool = True, verbose: bool = True):
        self.cfg = cfg
        self.verbose = verbose
        self.save_path = os.path.join(cfg.save_path, cfg.save_id)
        mkdir_if_missing(self.save_path)
        for sub in ("train", "valid", "pretrain", "testset"):
            mkdir_if_missing(os.path.join(self.save_path, "example", sub))

        if use_mesh:
            # the per-step batch must divide evenly over the data axis
            requested = cfg.num_devices or len(jax.devices())
            ndev = requested
            while cfg.batch_size % ndev or cfg.effective_val_batch_size % ndev:
                ndev -= 1
            if ndev != requested:
                if cfg.num_devices:
                    # the user asked for exactly this many devices; silently
                    # training on fewer would waste the rest of the slice
                    raise ValueError(
                        f"batch_size={cfg.batch_size} (val "
                        f"{cfg.effective_val_batch_size}) does not divide "
                        f"over the requested num_devices={cfg.num_devices}; "
                        "pick a divisible batch size or a different mesh")
                import warnings
                warnings.warn(
                    f"mesh REDUCED from {requested} to {ndev} devices so the "
                    f"batch (train {cfg.batch_size} / val "
                    f"{cfg.effective_val_batch_size}) divides the data axis "
                    f"— {requested - ndev} device(s) will sit idle. Set a "
                    "divisible batch_size or pass num_devices explicitly.",
                    RuntimeWarning, stacklevel=2)
            if cfg.num_slices > 1:
                # hierarchical ICI x DCN mesh (parallel/mesh.py)
                if ndev % cfg.num_slices:
                    raise ValueError(
                        f"{ndev} devices do not divide into "
                        f"num_slices={cfg.num_slices}")
                self.mesh = make_mesh_2d(cfg.num_slices,
                                         ndev // cfg.num_slices)
            else:
                self.mesh = make_mesh(ndev)
        else:
            self.mesh = None
        import jax.numpy as jnp
        dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                 else jnp.float32)
        self.lanenet = LaneNet(cfg, dtype=dtype)
        rng = jax.random.PRNGKey(cfg.seed)
        variables = self.lanenet.init(rng)
        variables = init_weights(variables, cfg.weight_init, rng)
        self.tx = define_optim(cfg.optimizer, cfg.learning_rate,
                               cfg.weight_decay, cfg.clip_grad_norm)
        state = init_train_state(variables, self.tx)
        self.state = replicate(state, self.mesh)
        self.scheduler = Scheduler(cfg.lr_policy, cfg.learning_rate,
                                   cfg.niter, cfg.niter_decay, cfg.gamma,
                                   cfg.lr_decay_iters)
        self._train_steps: Dict[str, callable] = {}
        self._eval_steps: Dict[str, callable] = {}
        self._val_infer = None  # lazy jitted infer fn for val_laneeval
        self._rng = jax.random.PRNGKey(cfg.seed + 1)

        # best-model policy (BEV min exact-area; BP max accuracy)
        self.minimize = cfg.profile == "bev" or not cfg.clas
        self.best_score = np.inf if self.minimize else -np.inf
        self.best_epoch = 0
        self.start_epoch = cfg.start_epoch

        if log_to_file:
            sys.stdout = Logger(os.path.join(
                self.save_path, f"log_train_start_{self.start_epoch}.txt"))
        if verbose:
            n_params = sum(int(np.prod(p.shape))
                           for p in jax.tree_util.tree_leaves(
                               variables["params"]))
            print("Number of parameters in model {} is {:.3f}M".format(
                cfg.mod.upper(), n_params / 1e6))

    # ------------------------------------------------------------------
    def train_step_for(self, phase: str):
        if phase not in self._train_steps:
            self._train_steps[phase] = make_train_step(
                self.lanenet, self.cfg, self.tx, phase, mesh=self.mesh)
        return self._train_steps[phase]

    def eval_step_for(self, phase: str):
        if phase not in self._eval_steps:
            self._eval_steps[phase] = make_eval_step(
                self.lanenet, self.cfg, phase, mesh=self.mesh)
        return self._eval_steps[phase]

    def _prefetch(self, loader) -> Iterable:
        sharding = batch_sharding(self.mesh) if self.mesh else None
        return DevicePrefetcher(loader, sharding, depth=self.cfg.prefetch)

    def next_rng(self):
        self._rng, key = jax.random.split(self._rng)
        return key

    # ------------------------------------------------------------------
    def maybe_resume(self) -> bool:
        """Resume from the latest epoch checkpoint (main.py:122-143)."""
        epoch = latest_checkpoint_epoch(self.save_path)
        if epoch is None:
            return False
        state, payload = load_checkpoint(_ckpt_path(self.save_path, epoch),
                                         jax.device_get(self.state))
        self.state = replicate(state, self.mesh)
        self.start_epoch = payload["epoch"]
        self.best_epoch = payload["best epoch"]
        self.best_score = payload["loss"]
        if self.verbose:
            print("=> loaded checkpoint (epoch {})".format(payload["epoch"]))
        return True

    # ------------------------------------------------------------------
    def train_epoch(self, train_loader, epoch: int) -> Dict[str, float]:
        cfg = self.cfg
        phase = cfg.phase_for_epoch(epoch)
        if cfg.lr_policy in ("lambda", "step"):
            lr = self.scheduler.epoch_lr(epoch)
            self.state = self.state.replace(
                opt_state=set_lr(self.state.opt_state, lr))
            if self.verbose:
                print("lr is set to {}".format(lr))
        step = self.train_step_for(phase)
        train_loader.set_epoch(epoch)

        meters: Dict[str, AverageMeter] = {}
        batch_time, data_time = AverageMeter(), AverageMeter()
        end = time.time()
        bs = cfg.batch_size
        for i, batch in enumerate(self._prefetch(train_loader)):
            data_time.update(time.time() - end)
            self.state, metrics = step(self.state, batch, self.next_rng())
            jax.block_until_ready(metrics["loss"])
            batch_time.update(time.time() - end)
            end = time.time()
            for k, v in metrics.items():
                meters.setdefault(k, AverageMeter()).update(float(v), bs)
            if self.verbose and (i + 1) % cfg.print_freq == 0:
                print("Epoch: [{0}][{1}/{2}]\t"
                      "Time {bt.val:.3f} ({bt.avg:.3f})\t"
                      "Loss {loss.val:.8f} ({loss.avg:.8f})".format(
                          epoch + 1, i + 1, len(train_loader),
                          bt=batch_time, loss=meters["loss"]))
            # periodic weight-map dump during training
            # (Birds_Eye_View_Loss/main.py:291-295)
            if cfg.save_freq and (i + 1) % cfg.save_freq == 0:
                self.visualize_batch(batch, epoch, batch_idx=i + 1,
                                     mode="train")
                end = time.time()  # don't bill plotting to the next batch
        out = {k: m.avg for k, m in meters.items()}
        out["batch_time"] = batch_time.avg
        out["data_time"] = data_time.avg
        return out

    # ------------------------------------------------------------------
    def validate(self, valid_loader, epoch: int = 0,
                 valid_set_labels: Optional[list] = None
                 ) -> Dict[str, float]:
        """Validation pass; optionally writes fitted-curve records and (BEV,
        clas, 4 lanes) scores them with LaneEval (main.py:362-500)."""
        cfg = self.cfg
        phase = cfg.phase_for_epoch(epoch)
        if phase == "skip":
            phase = "seg"  # reference never validates mid-skip; seg is closest
        step = self.eval_step_for(phase)
        # Opt-in (--val_laneeval): LaneEval-score the validation split in the
        # BP profile, so runs without a TuSimple test set still produce an
        # accuracy curve. The reference only scores the test set
        # (Backprojection_Loss/main.py:389-396); the scoring math here is the
        # test path's own jitted infer fn (eval/test_driver.py::make_infer_fn)
        # run on validation batches, so val_acc and test_acc are comparable.
        bp_laneeval = (cfg.val_laneeval and cfg.profile == "bp" and cfg.clas
                       and cfg.end_to_end and phase == "e2e"
                       and valid_set_labels is not None)
        if bp_laneeval and self._val_infer is None:
            from lanedetection_end2end_tpu.eval.projections import Projections
            from lanedetection_end2end_tpu.eval.test_driver import \
                make_infer_fn
            self._val_infer = make_infer_fn(
                self.lanenet, cfg,
                Projections(cfg.resize, cfg.order, cfg.no_mapping))
        lanes_pred_all = []
        meters: Dict[str, AverageMeter] = {}
        records = []
        counter = 0
        for i, batch in enumerate(self._prefetch(valid_loader)):
            metrics, outputs = step(self.state, batch)
            if bp_laneeval:
                from lanedetection_end2end_tpu.train.steps import \
                    prepare_batch
                lanes_pred_all.append(np.asarray(self._val_infer(
                    self.state.variables, prepare_batch(batch)["image"])))
            # weight-map dump every 25 validation batches
            # (Birds_Eye_View_Loss/main.py:477-481)
            if (i + 1) % 25 == 0:
                self.visualize_batch(batch, epoch, batch_idx=i + 1,
                                     mode="valid")
            for k, v in metrics.items():
                meters.setdefault(k, AverageMeter()).update(
                    float(v), cfg.effective_val_batch_size)
            if cfg.clas and valid_set_labels is not None:
                beta = np.asarray(outputs["beta"])  # (B, C, o+1)
                line = np.asarray(outputs.get(
                    "line_pred", np.zeros((beta.shape[0], 4))))
                horizon = np.asarray(outputs.get(
                    "horizon_pred", np.zeros((beta.shape[0], cfg.resize))))
                for j in range(beta.shape[0]):
                    rec = dict(valid_set_labels[counter])
                    rec["params"] = beta[j, : cfg.nclasses].tolist()
                    rec["line_id"] = np.asarray(line[j]).astype(int).tolist()
                    rec["horizon_est"] = np.asarray(
                        horizon[j]).astype(float).tolist()
                    records.append(rec)
                    counter += 1
        out = {k: m.avg for k, m in meters.items()}

        if cfg.clas and valid_set_labels is not None and records:
            val_set_path = os.path.join(self.save_path,
                                        "validation_set_dst.json")
            write_json_lines(val_set_path, records)
            if cfg.nclasses > 3 and cfg.profile == "bev":
                ls_result_path = os.path.join(self.save_path,
                                              "ls_result.json")
                write_lsq_results(val_set_path, ls_result_path, cfg.nclasses,
                                  False, False, cfg.resize,
                                  no_ortho=cfg.no_ortho)
                acc = LaneEval.bench_one_submit(ls_result_path, val_set_path)
                out["acc_seg"] = acc[0]
                if self.verbose:
                    print("===> Average ACC_SEG on val is {:.8}".format(acc[0]))

        if bp_laneeval and lanes_pred_all:
            # valid_set_labels are TuSimple gt lines ({lanes, h_samples,
            # raw_file}, from label_data_all.json) in loader order; padded
            # final-batch rows are sliced off.
            lanes = np.concatenate(lanes_pred_all, axis=0)
            n = min(lanes.shape[0], len(valid_set_labels))
            gt_path = os.path.join(self.save_path, "validation_gt.json")
            pred_path = os.path.join(self.save_path,
                                     "validation_predictions.json")
            write_json_lines(gt_path, valid_set_labels[:n])
            preds = []
            for j in range(n):
                rec = dict(valid_set_labels[j])
                rec["lanes"] = np.int_(np.round(lanes[j])).tolist()
                rec["run_time"] = 20
                preds.append(rec)
            write_json_lines(pred_path, preds)
            acc = LaneEval.bench_one_submit(pred_path, gt_path)
            out["acc"] = acc[0]
            if self.verbose:
                print("===> Average LaneEval ACC on val is {:.8}".format(
                    acc[0]))
        return out

    # ------------------------------------------------------------------
    def fit(self, train_loader, valid_loader, test_loader=None,
            valid_set_labels: Optional[list] = None,
            nepochs: Optional[int] = None) -> Dict[str, float]:
        """The full epoch loop (main.py:171-357). Returns final metrics."""
        cfg = self.cfg
        last: Dict[str, float] = {}
        for epoch in range(self.start_epoch, nepochs or cfg.nepochs):
            if self.verbose:
                print("\n => Start train set for EPOCH {}".format(epoch + 1))
            phase = cfg.phase_for_epoch(epoch)
            train_metrics = self.train_epoch(train_loader, epoch)
            last = {f"train_{k}": v for k, v in train_metrics.items()}
            if self.verbose:
                print("===> Average loss on training set is {:.8f}".format(
                    train_metrics["loss"]))

            if phase == "skip":
                # BP tree skips validation during the warm-up epochs
                # (main.py:369-375)
                self._checkpoint(epoch, score=None)
                self._log_scalars(epoch, last)
                continue

            # reference guards empty validation loaders
            # (Backprojection_Loss/main.py:378)
            if valid_loader is not None and len(valid_loader) > 0:
                val_metrics = self.validate(valid_loader, epoch,
                                            valid_set_labels)
            else:
                val_metrics = {"loss": train_metrics["loss"]}
            last.update({f"val_{k}": v for k, v in val_metrics.items()})
            if self.verbose:
                print("===> Average loss on validation set is {:.8f}".format(
                    val_metrics["loss"]))

            # Epoch score driving best-model tracking + plateau schedule:
            # BEV: exact trapezoidal area (main.py:334-338);
            # BP: TuSimple test accuracy when clas (main.py:389-396),
            #     else validation loss.
            if cfg.profile == "bev":
                score = val_metrics.get("exact_area", val_metrics["loss"])
            elif cfg.clas and test_loader is not None and cfg.end_to_end:
                score = test_model(test_loader, self.lanenet,
                                   self.state.variables, cfg,
                                   save_path=self.save_path,
                                   verbose=self.verbose)
                last["test_acc"] = score
            else:
                score = val_metrics["loss"]

            if cfg.lr_policy == "plateau":
                lr = self.scheduler.plateau_step(score)
                self.state = self.state.replace(
                    opt_state=set_lr(self.state.opt_state, lr))
                if self.verbose:
                    print("LR plateaued, hence is set to {}".format(lr))

            self._checkpoint(epoch, score)
            self._log_scalars(epoch, last)
        return last

    def _log_scalars(self, epoch: int, metrics: Dict[str, float]) -> None:
        """Per-epoch scalar log (the tensorboardX analog, BEV main.py:322-332
        — written as JSONL so no TB dependency is needed; default-on, unlike
        the reference's default-off --no_tb)."""
        import json
        rec = {"epoch": epoch + 1, "lr": get_lr(self.state.opt_state)}
        rec.update({k: float(v) for k, v in metrics.items()})
        with open(os.path.join(self.save_path, "scalars.jsonl"), "a") as f:
            json.dump(rec, f)
            f.write("\n")

    # ------------------------------------------------------------------
    def visualize_batch(self, batch, epoch: int, batch_idx: int = 0,
                        mode: str = "train"):
        """Per-epoch weight-map dump (save_weightmap, utils.py:95-155 /
        save_freq plotting, main.py:291-295)."""
        from lanedetection_end2end_tpu.train.steps import prepare_batch
        cfg = self.cfg
        phase = cfg.phase_for_epoch(epoch)
        batch = prepare_batch(batch)
        out = self.lanenet.apply(self.state.variables, batch["image"],
                                 phase=phase, train=False,
                                 gt_line=batch.get("line"))
        if phase == "skip":
            return save_pretrain_panel(batch["image"], batch["gt"],
                                       out.seg_logits, self.save_path,
                                       batch_idx)
        gt = batch.get("params", batch.get("lanes"))
        return save_weightmap(mode, out.weightmaps, out.beta, gt,
                              batch["image"], self.save_path, batch_idx,
                              resize=cfg.resize)

    # ------------------------------------------------------------------
    def _checkpoint(self, epoch: int, score: Optional[float]):
        is_best = False
        if score is not None:
            better = (score < self.best_score if self.minimize
                      else score > self.best_score)
            if better:
                is_best = True
                self.best_epoch = epoch + 1
                self.best_score = float(score)
        save_checkpoint(self.save_path, self.state, epoch, self.best_epoch,
                        self.best_score, self.cfg.mod, is_best)
