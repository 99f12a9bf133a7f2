"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
xla_force_host_platform_device_count (SURVEY.md §5.8).

NOTE: this machine preimports jax at interpreter startup (PYTHONPATH
sitecustomize) with JAX_PLATFORMS=axon, so env vars set here are too late.
Backends initialize lazily though, so jax.config.update still wins as long
as no computation ran yet.
"""

import os

import re

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" in flags:
    # override an inherited count rather than failing the whole session on
    # the 8-device assert below
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+",
        "--xla_force_host_platform_device_count=8", flags,
    )
    os.environ["XLA_FLAGS"] = flags
else:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# keep float32 matmuls exact on CPU for the numerical-parity suite
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()


# -- fast/slow split ---------------------------------------------------------
# The full suite is 30-40 min warm; `-m "not slow"` is the <10-min core
# (parity + unit surfaces). Multi-minute end-to-end smokes are marked slow
# by module here (measured with --durations=0); individual tests can also
# opt in with @pytest.mark.slow.
SLOW_TEST_MODULES = {
    "test_cli_smoke",        # executes every CLI command body end-to-end
    "test_export_serving",   # AOT export/load round trips
    "test_graft_entry",      # single-chip compile + 8-device dryrun
    "test_track_artifact",   # trains both cores (miniature) + drift probes
    "test_multiprocess_dp",  # spawns 2 real processes with their own jax
    "test_training_e2e",     # train/ckpt/resume loops
    "test_copy_task_training",
    # kernel-grad-parity sweeps and training smokes measured >25s each
    # (--durations; the hardware kernel checks run separately per round)
    "test_pallas_bptt",
    "test_pallas_packed",
    "test_heatmap_experiment",
    "test_active_resize",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        module = item.nodeid.split("::")[0].rsplit("/", 1)[-1].removesuffix(".py")
        if module in SLOW_TEST_MODULES:
            item.add_marker(pytest.mark.slow)
