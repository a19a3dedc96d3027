"""Training subsystem tests: optimizer parity vs torch, schedulers, jitted
steps on the 8-device mesh, Trainer end-to-end on synthetic data, and
checkpoint/resume."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lanedetection_end2end_tpu.config import bp_defaults, bev_defaults
from lanedetection_end2end_tpu.data import (
    LaneDataset, Loader, SyntheticLanes, make_synthetic_root)
from lanedetection_end2end_tpu.models import LaneNet, init_weights
from lanedetection_end2end_tpu.parallel import (
    make_mesh, replicate, shard_batch)
from lanedetection_end2end_tpu.train import (
    Scheduler, Trainer, define_optim, make_eval_step, make_train_step,
    save_checkpoint, load_checkpoint, latest_checkpoint_epoch)
from lanedetection_end2end_tpu.train.checkpoint import (
    best_checkpoint_path, _ckpt_path)
from lanedetection_end2end_tpu.train.optim import get_lr, set_lr
from lanedetection_end2end_tpu.train.state import init_train_state


# ----------------------------------------------------------------------
# Optimizers: parity with torch semantics
# ----------------------------------------------------------------------

@pytest.mark.parametrize("name", ["adam", "sgd", "rmsprop"])
def test_optimizer_matches_torch(name):
    import torch
    lr, wd = 1e-2, 1e-3
    w0 = np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32)
    g = np.random.default_rng(1).normal(size=(5, 3)).astype(np.float32)

    # torch reference (utils.py:411-420 hyperparameters)
    wt = torch.nn.Parameter(torch.tensor(w0.copy()))
    if name == "adam":
        opt = torch.optim.Adam([wt], lr=lr, weight_decay=wd)
    elif name == "sgd":
        opt = torch.optim.SGD([wt], lr=lr, momentum=0.9, weight_decay=wd)
    else:
        opt = torch.optim.RMSprop([wt], lr=lr, momentum=0.9, weight_decay=wd)
    for _ in range(3):
        opt.zero_grad()
        wt.grad = torch.tensor(g.copy())
        opt.step()

    tx = define_optim(name, lr, weight_decay=wd)
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)
    for _ in range(3):
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state,
                                       params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               wt.detach().numpy(), rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("name", ["adam", "sgd", "rmsprop"])
def test_flat_optimizer_matches_per_leaf(name):
    """optax.flatten'd chain (the TPU launch-overhead fix, train/optim.py)
    must be bit-equivalent to the per-leaf chain, and keep the injected
    learning rate reachable for the scheduler."""
    params = {"a": jnp.full((3, 4), 0.5),
              "b": {"w": jnp.arange(5.0), "c": jnp.ones(())}}
    grads = jax.tree_util.tree_map(lambda p: p * 0.1 + 0.03, params)
    t_flat = define_optim(name, 1e-3, weight_decay=1e-4, clip_grad_norm=1.0,
                          flatten=True)
    t_leaf = define_optim(name, 1e-3, weight_decay=1e-4, clip_grad_norm=1.0,
                          flatten=False)
    sf, sl = t_flat.init(params), t_leaf.init(params)
    pf = pl = params
    for i in range(3):
        gi = jax.tree_util.tree_map(lambda g: g * (i + 1), grads)
        uf, sf = t_flat.update(gi, sf, pf)
        ul, sl = t_leaf.update(gi, sl, pl)
        pf = jax.tree_util.tree_map(lambda p, u: p + u, pf, uf)
        pl = jax.tree_util.tree_map(lambda p, u: p + u, pl, ul)
    for (path, lf), (_, ll) in zip(jax.tree_util.tree_leaves_with_path(pf),
                                   jax.tree_util.tree_leaves_with_path(pl)):
        np.testing.assert_allclose(np.asarray(lf), np.asarray(ll), rtol=1e-6,
                                   err_msg=f"{name} {path}")
    sf = set_lr(sf, 5e-4)
    assert abs(get_lr(sf) - 5e-4) < 1e-12


def test_lr_injection():
    tx = define_optim("adam", 1e-3)
    state = tx.init({"w": jnp.zeros(3)})
    assert get_lr(state) == pytest.approx(1e-3)
    state = set_lr(state, 5e-4)
    assert get_lr(state) == pytest.approx(5e-4)


# ----------------------------------------------------------------------
# Schedulers (utils.py:423-441 semantics)
# ----------------------------------------------------------------------

def test_lambda_schedule():
    s = Scheduler("lambda", 1.0, niter=5, niter_decay=9)
    assert s.epoch_lr(0) == pytest.approx(1.0)
    assert s.epoch_lr(4) == pytest.approx(1.0)   # epochs < niter: flat
    assert s.epoch_lr(5) == pytest.approx(1.0 - 1 / 10)
    assert s.epoch_lr(13) == pytest.approx(1.0 - 9 / 10)


def test_step_schedule():
    s = Scheduler("step", 1.0, gamma=0.5, lr_decay_iters=2)
    assert [s.epoch_lr(e) for e in range(5)] == [1.0, 1.0, 0.5, 0.5, 0.25]


def test_plateau_schedule():
    s = Scheduler("plateau", 1.0, gamma=0.1, lr_decay_iters=1)
    assert s.plateau_step(1.0) == 1.0   # first score becomes best
    assert s.plateau_step(1.0) == 1.0   # bad 1 (patience 1)
    assert s.plateau_step(1.0) == pytest.approx(0.1)  # bad 2 -> decay
    assert s.plateau_step(0.01) == pytest.approx(0.1)  # improvement resets


# ----------------------------------------------------------------------
# Train/eval steps on the virtual mesh
# ----------------------------------------------------------------------

def _mini_setup(profile="bp", **kw):
    mk = bp_defaults if profile == "bp" else bev_defaults
    base = dict(resize=32, batch_size=8, nclasses=4, order=3, end_to_end=True,
                reg_ls=1.0, loss_policy="backproject")
    if profile == "bev":
        base.update(order=2, loss_policy="area")
    base.update(kw)
    cfg = mk(**base)
    net = LaneNet(cfg)
    rng = jax.random.PRNGKey(0)
    variables = init_weights(net.init(rng), cfg.weight_init, rng)
    tx = define_optim(cfg.optimizer, cfg.learning_rate)
    mesh = make_mesh()
    state = replicate(init_train_state(variables, tx), mesh)
    return cfg, net, tx, mesh, state


def test_train_step_decreases_loss_on_mesh():
    cfg, net, tx, mesh, state = _mini_setup("bev")
    step = make_train_step(net, cfg, tx, "e2e")
    batch = shard_batch(SyntheticLanes(8, 32, 4, "bev").batch(), mesh)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    # state stays replicated across all 8 devices
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_eval_step_outputs():
    cfg, net, tx, mesh, state = _mini_setup("bp", clas=True)
    step = make_eval_step(net, cfg, "e2e")
    batch = shard_batch(SyntheticLanes(8, 32, 4, "bp").batch(), mesh)
    metrics, outputs = step(state, batch)
    assert outputs["beta"].shape == (8, 4, 4)
    assert outputs["x_cal"].shape == (8, 4, 56)
    assert "acc_line" in metrics and "acc_horizon" in metrics


def test_seg_phase_requires_background_channel():
    cfg, net, tx, mesh, state = _mini_setup("bp")  # no dual head
    step = make_train_step(net, cfg, tx, "seg", donate=False)
    batch = shard_batch(SyntheticLanes(8, 32, 4, "bp").batch(), mesh)
    with pytest.raises(ValueError, match="background channel"):
        step(state, batch, jax.random.PRNGKey(0))


# ----------------------------------------------------------------------
# Checkpointing
# ----------------------------------------------------------------------

def test_checkpoint_roundtrip(tmp_path):
    cfg, net, tx, mesh, state = _mini_setup("bp")
    save_path = str(tmp_path)
    save_checkpoint(save_path, state, epoch=0, best_epoch=1, best_score=0.5,
                    is_best=True)
    save_checkpoint(save_path, state, epoch=1, best_epoch=1, best_score=0.5)
    # rolling deletion: epoch-0 checkpoint gone, best copy kept
    assert not os.path.exists(_ckpt_path(save_path, 0))
    assert os.path.exists(_ckpt_path(save_path, 1))
    assert best_checkpoint_path(save_path) is not None
    assert latest_checkpoint_epoch(save_path) == 1

    template = jax.device_get(state)
    restored, payload = load_checkpoint(_ckpt_path(save_path, 1), template)
    assert payload["epoch"] == 2 and payload["best epoch"] == 1
    a = jax.tree_util.tree_leaves(template.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ----------------------------------------------------------------------
# Trainer end-to-end on the synthetic dataset
# ----------------------------------------------------------------------

@pytest.fixture(scope="module")
def root(tmp_path_factory):
    return make_synthetic_root(str(tmp_path_factory.mktemp("synth_train")),
                               num_train=8, num_test=2, seed=4)


def test_trainer_fit_and_resume(root, tmp_path):
    cfg = bp_defaults(resize=32, batch_size=4, nclasses=4, order=3,
                      end_to_end=True, loss_policy="backproject", reg_ls=1.0,
                      learning_rate=2e-4, save_path=str(tmp_path),
                      print_freq=1000, num_train=8)
    ds = LaneDataset("bp", root["image_dir"], root["gt_dir"], valid_idx=[],
                     resize=32, nclasses=4, lanes_file=root["lanes_file"],
                     line_file=root["line_file"])
    train_loader = Loader(ds, range(8), 4, shuffle=True, seed=0)
    valid_loader = Loader(ds, range(4), 4, shuffle=False)

    trainer = Trainer(cfg, log_to_file=False, verbose=False)
    metrics = trainer.fit(train_loader, valid_loader, nepochs=2)
    assert np.isfinite(metrics["train_loss"])
    assert np.isfinite(metrics["val_loss"])
    assert latest_checkpoint_epoch(trainer.save_path) == 1

    # Resume: a fresh trainer picks up epoch 2
    trainer2 = Trainer(cfg, log_to_file=False, verbose=False)
    assert trainer2.maybe_resume()
    assert trainer2.start_epoch == 2
    assert trainer2.best_score == trainer.best_score
    # resumed params identical
    a = jax.tree_util.tree_leaves(jax.device_get(trainer.state.params))[0]
    b = jax.tree_util.tree_leaves(jax.device_get(trainer2.state.params))[0]
    np.testing.assert_array_equal(a, b)


def test_trainer_staged_pretraining_phases(root, tmp_path):
    """skip -> seg -> e2e schedule compiles and runs (BP get_flags)."""
    cfg = bp_defaults(resize=32, batch_size=4, nclasses=4, order=3,
                      end_to_end=True, pretrained=True, pretrain_epochs=2,
                      skip_epochs=1, loss_policy="backproject", reg_ls=1.0,
                      save_path=str(tmp_path), print_freq=1000, num_train=8)
    assert [cfg.phase_for_epoch(e) for e in range(4)] == \
        ["skip", "seg", "e2e", "e2e"]
    ds = LaneDataset("bp", root["image_dir"], root["gt_dir"], valid_idx=[],
                     resize=32, nclasses=4, lanes_file=root["lanes_file"],
                     line_file=root["line_file"])
    train_loader = Loader(ds, range(8), 4, shuffle=True, seed=0)
    valid_loader = Loader(ds, range(4), 4, shuffle=False)
    trainer = Trainer(cfg, log_to_file=False, verbose=False)
    metrics = trainer.fit(train_loader, valid_loader, nepochs=3)
    assert np.isfinite(metrics["train_loss"])


def test_bfloat16_training_step():
    """compute_dtype='bfloat16' trains with finite loss (params stay f32)."""
    cfg, net, tx, mesh, state = None, None, None, None, None
    cfg = bp_defaults(resize=32, batch_size=8, nclasses=4, order=3,
                      end_to_end=True, reg_ls=1.0, loss_policy="backproject",
                      compute_dtype="bfloat16")
    net = LaneNet(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = init_weights(net.init(rng), cfg.weight_init, rng)
    leaf = jax.tree_util.tree_leaves(variables["params"])[0]
    assert leaf.dtype == jnp.float32  # params stay f32, compute is bf16
    tx = define_optim("adam", 1e-4)
    mesh = make_mesh()
    state = replicate(init_train_state(variables, tx), mesh)
    step = make_train_step(net, cfg, tx, "e2e")
    batch = shard_batch(SyntheticLanes(8, 32, 4, "bp").batch(), mesh)
    state, metrics = step(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))


def test_save_freq_visualization_cadence(root, tmp_path):
    """Trainer dumps weight-map panels every save_freq train batches
    (Birds_Eye_View_Loss/main.py:291-295) without manual calls."""
    cfg = bp_defaults(resize=32, batch_size=4, nclasses=4, order=3,
                      end_to_end=True, loss_policy="backproject", reg_ls=1.0,
                      save_path=str(tmp_path), print_freq=1000, num_train=8,
                      save_freq=1)
    ds = LaneDataset("bp", root["image_dir"], root["gt_dir"], valid_idx=[],
                     resize=32, nclasses=4, lanes_file=root["lanes_file"],
                     line_file=root["line_file"])
    train_loader = Loader(ds, range(8), 4, shuffle=True, seed=0)
    valid_loader = Loader(ds, range(4), 4, shuffle=False)
    trainer = Trainer(cfg, log_to_file=False, verbose=False)
    trainer.fit(train_loader, valid_loader, nepochs=1)
    train_dir = os.path.join(trainer.save_path, "example", "train")
    assert len(os.listdir(train_dir)) == 2  # 8 imgs / bs4 = 2 batches


def test_use_pallas_wls_flag_reaches_fitter():
    """config.use_pallas_wls is plumbed to WLSFitter (None = backend auto)."""
    for forced in (True, False):
        cfg = bp_defaults(resize=32, batch_size=4, reg_ls=1.0,
                          use_pallas_wls=forced)
        assert LaneNet(cfg).fitter.use_pallas is forced
    cfg = bp_defaults(resize=32, batch_size=4, reg_ls=1.0)
    assert cfg.use_pallas_wls is None
    auto = LaneNet(cfg).fitter.use_pallas
    assert auto == (jax.default_backend() == "tpu")


def test_mesh_guardrails(tmp_path):
    """Indivisible batches must not silently shrink the mesh: an explicit
    num_devices request hard-errors, an implicit all-devices mesh reduces
    with a loud RuntimeWarning (train/driver.py)."""
    with pytest.raises(ValueError, match="does not divide"):
        Trainer(bp_defaults(resize=32, batch_size=7, nclasses=4, order=3,
                            end_to_end=True, loss_policy="backproject",
                            reg_ls=1.0, save_path=str(tmp_path / "a"),
                            num_devices=8),
                log_to_file=False, verbose=False)
    with pytest.warns(RuntimeWarning, match="REDUCED"):
        t = Trainer(bp_defaults(resize=32, batch_size=7, val_batch_size=7,
                                nclasses=4, order=3, end_to_end=True,
                                loss_policy="backproject", reg_ls=1.0,
                                save_path=str(tmp_path / "b")),
                    log_to_file=False, verbose=False)
    assert t.mesh.devices.size == 7


def test_checkpoint_roundtrip_sharded_mesh(tmp_path):
    """Checkpoint lifecycle on a SHARDED state: save from a hierarchical
    2x4-mesh-replicated TrainState (device_get gathers), restore into a
    host template, re-replicate onto the mesh, and keep stepping."""
    from lanedetection_end2end_tpu.config import train_sh_config
    from lanedetection_end2end_tpu.models import LaneNet
    from lanedetection_end2end_tpu.parallel import (
        make_mesh_2d, replicate, shard_batch)
    from lanedetection_end2end_tpu.train.checkpoint import (
        save_checkpoint, load_checkpoint, _ckpt_path)

    cfg = train_sh_config(resize=32, batch_size=8, reg_ls=1.0,
                          packed_train=True)
    lanenet = LaneNet(cfg)
    variables = lanenet.init(jax.random.PRNGKey(0))
    tx = define_optim("sgd", cfg.learning_rate)
    mesh = make_mesh_2d(2, 4)
    state = replicate(init_train_state(variables, tx), mesh)
    batch = shard_batch(SyntheticLanes(8, 32, 4, "bp").batch(), mesh)
    step = make_train_step(lanenet, cfg, tx, "e2e", donate=False, mesh=mesh)
    state, metrics = step(state, batch, None)

    save_checkpoint(str(tmp_path), state, epoch=0, best_epoch=0,
                    best_score=float(metrics["loss"]), is_best=True)
    template = init_train_state(variables, tx)
    restored, payload = load_checkpoint(_ckpt_path(str(tmp_path), 0),
                                        template)
    assert payload["epoch"] == 1
    a = jax.tree_util.tree_leaves(jax.device_get(state.params))[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resume onto the mesh and take another step
    state2 = replicate(restored, mesh)
    state2, metrics2 = step(state2, batch, None)
    assert np.isfinite(float(metrics2["loss"]))


def test_multiprocess_loader_feeds_sharded_train_step(tmp_path):
    """Simulated 2-process x 4-device multi-host run: two Loaders with
    process_index 0/1 each decode only their contiguous local rows of the
    global batch; the global array assembled from those per-process halves
    (the make_array_from_process_local_data device layout) drives the
    sharded train step to the same result as a single-process device_put of
    the full batch — validating Loader._local_slice's alignment with
    NamedSharding(P('data')) end to end through the Trainer's step."""
    from lanedetection_end2end_tpu.config import train_sh_config
    from lanedetection_end2end_tpu.data.loader import collate
    from lanedetection_end2end_tpu.models import LaneNet
    from lanedetection_end2end_tpu.parallel import (
        batch_sharding, make_mesh, replicate, shard_batch)

    root = make_synthetic_root(str(tmp_path / "d"), num_train=8, num_test=0,
                               seed=9)
    ds = LaneDataset("bp", root["image_dir"], root["gt_dir"], valid_idx=[],
                     resize=32, nclasses=4, lanes_file=root["lanes_file"],
                     line_file=root["line_file"])
    B = 8
    # one loader per simulated process — identical seed => identical order
    loaders = [Loader(ds, range(8), B, shuffle=True, seed=3, nworkers=1,
                      process_index=p, process_count=2) for p in (0, 1)]
    local0 = next(iter(loaders[0]))
    local1 = next(iter(loaders[1]))
    full_loader = Loader(ds, range(8), B, shuffle=True, seed=3, nworkers=1)
    full = next(iter(full_loader))
    # local halves are exactly the contiguous rows of the global batch
    for k in full:
        np.testing.assert_array_equal(local0[k], full[k][: B // 2])
        np.testing.assert_array_equal(local1[k], full[k][B // 2:])

    mesh = make_mesh(8)
    sharding = batch_sharding(mesh)
    devices = list(mesh.devices.reshape(-1))

    def assemble(k):
        """Per-device shards drawn from the OWNING process's local rows —
        the layout make_array_from_process_local_data produces when each
        process holds devices [p*4, p*4+4)."""
        rows = B // 8
        shards = []
        for d in range(8):
            local = local0 if d < 4 else local1
            off = (d % 4) * rows
            shards.append(jax.device_put(local[k][off:off + rows],
                                         devices[d]))
        shape = (B,) + full[k].shape[1:]
        return jax.make_array_from_single_device_arrays(shape, sharding,
                                                        shards)

    global_batch = {k: assemble(k) for k in full}

    cfg = train_sh_config(resize=32, batch_size=B, reg_ls=1.0,
                          packed_train=True)
    lanenet = LaneNet(cfg)
    variables = lanenet.init(jax.random.PRNGKey(0))
    tx = define_optim("sgd", cfg.learning_rate)
    step = make_train_step(lanenet, cfg, tx, "e2e", donate=False, mesh=mesh)

    state_a = replicate(init_train_state(variables, tx), mesh)
    _, metrics_a = step(state_a, global_batch, None)
    state_b = replicate(init_train_state(variables, tx), mesh)
    _, metrics_b = step(state_b, shard_batch(full, mesh), None)
    np.testing.assert_allclose(float(metrics_a["loss"]),
                               float(metrics_b["loss"]), rtol=1e-6)


def test_packed_compiler_options_dtype_scaled(monkeypatch):
    """The fused-backward scoped-VMEM limit must scale with compute dtype:
    bf16 planes fit in 32 MB, f32 planes need 48 MB (measured: the decoder
    NB16 backward allocates 37.35 MB in f32 at resize 256 and a 32 MB
    limit fails the TPU compile with a scoped-vmem stack OOM)."""
    import jax.numpy as jnp
    from lanedetection_end2end_tpu.train import steps as steps_mod

    monkeypatch.setenv("PACKED_FUSED_BLOCKS", "1")
    monkeypatch.setattr(steps_mod.jax, "default_backend", lambda: "tpu")
    assert steps_mod._packed_compiler_options(True, jnp.bfloat16) == {
        "xla_tpu_scoped_vmem_limit_kib": "32768"}
    for dtype in (jnp.float32, None):
        assert steps_mod._packed_compiler_options(True, dtype) == {
            "xla_tpu_scoped_vmem_limit_kib": "49152"}
    # unfused or non-TPU: no options
    monkeypatch.setenv("PACKED_FUSED_BLOCKS", "0")
    assert steps_mod._packed_compiler_options(True, jnp.float32) is None
    monkeypatch.setattr(steps_mod.jax, "default_backend", lambda: "cpu")
    assert steps_mod._packed_compiler_options(True, jnp.bfloat16) is None
