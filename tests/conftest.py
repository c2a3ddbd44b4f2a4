"""Test config: force an 8-device virtual CPU platform so every test
exercises the multi-device data-parallel path without TPUs.

Note: this machine's sitecustomize pins jax_platforms to the 'axon' TPU
tunnel, which ignores the JAX_PLATFORMS env var — we must override via
jax.config BEFORE any jax computation runs.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"
# no egress here: fail SBERT downloads instantly (the hashed-BoW fallback
# engages) instead of burning minutes in hub retries
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent XLA compile cache: the suite is compile-dominated (~38 min cold);
# warm reruns skip most of it
jax.config.update("jax_compilation_cache_dir", "/tmp/vmr_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Test tiers.  `pytest -m quick` = the fast gate (< ~5 min warm): every zoo
# family's forward/loss/infer (test_model_zoo), the numpy data/label/metric
# layer, and the flax layer-library unit tests.  Everything else (the
# compile-heavy torch-parity suites, end-to-end training, multihost, serving)
# is the full tier, still run by a plain `pytest tests/`.
# ---------------------------------------------------------------------------
QUICK_MODULES = {
    "test_labels", "test_metrics", "test_losses", "test_augment", "test_optim",
    "test_layers", "test_reference_configs", "test_reference_data",
    "test_offline_tools", "test_native_nms", "test_feature_stores",
    "test_input_pipeline", "test_windowed", "test_model_zoo",
    "test_precision_policy", "test_checkpoint_restore", "test_dropout",
    "test_dp_equivalence",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in QUICK_MODULES and "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(scope="session")
def charades_cfg():
    from vmrframe_tpu.config import load_config

    return load_config(os.path.join(os.path.dirname(__file__), "configs", "charades_seqpan.yaml"))
