"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding is exercised without TPU hardware.

NOTE: on this machine the axon TPU plugin preloads `jax` at interpreter
startup, so setting JAX_PLATFORMS/JAX_PLATFORM_NAME inside the process is too
late. `jax.config.update('jax_platforms', ...)` still works because the
backend itself initializes lazily — as does XLA_FLAGS, which the CPU client
reads at client-creation time.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect a virtual 8-device CPU mesh"


# ----------------------------------------------------------------------
# Smoke tier: one representative test per subsystem, selected with
# `python -m pytest tests -m smoke -q` (marker registered in pytest.ini).
# The full suite's Pallas interpret-mode shards dominate its runtime on
# 1-core hosts; this tier verifies every subsystem in a fraction of it.
# ----------------------------------------------------------------------

_SMOKE = {
    "test_geometry.py::test_inverse_roundtrip",
    "test_wls.py::test_wls_recovers_known_polynomial",
    "test_losses.py::test_area_loss_closed_form_matches_numeric[none]",
    "test_losses.py::test_backprojection_loss_reference_constants",
    "test_models.py::test_lanenet_e2e_forward[bp-True]",
    "test_data.py::test_loader_shapes_and_determinism",
    "test_eval.py::test_lane_eval_perfect_predictions",
    "test_eval.py::test_projections_match_backprojection_loss",
    "test_train.py::test_checkpoint_roundtrip",
    "test_train.py::test_train_step_decreases_loss_on_mesh",
    "test_packed_graph.py::test_eval_forward_parity",
    "test_cli_and_validate.py::test_cli_parses_reference_train_sh",
    "test_native.py::test_resample_matches_pil_bilinear",
    "test_dlt.py::test_zero_offsets_reproduce_fixed_matrix",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        if item.nodeid.split("/")[-1] in _SMOKE:
            item.add_marker(pytest.mark.smoke)
