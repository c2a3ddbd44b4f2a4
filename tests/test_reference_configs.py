"""Public-config compatibility: every config file shipped by the reference
must parse through our loader, and its model name must resolve in the
registry (BASELINE.json: 'Public YAML configs ... are preserved')."""

import glob
import os

import pytest

from vmrframe_tpu.config import load_config
from vmrframe_tpu.registry import MODEL_REGISTRY, get_model_entry

REF_CONFIG_DIR = "/root/reference/config"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_CONFIG_DIR), reason="reference configs not mounted"
)


def _all_configs():
    return sorted(
        glob.glob(os.path.join(REF_CONFIG_DIR, "*", "*.yaml"))
        + glob.glob(os.path.join(REF_CONFIG_DIR, "*", "*.json"))
    )


def test_reference_configs_found():
    assert len(_all_configs()) >= 30


@pytest.mark.parametrize("path", _all_configs(), ids=lambda p: "/".join(p.split("/")[-2:]))
def test_config_parses_and_model_registered(path):
    cfg = load_config(path)
    if "model" not in cfg or "name" not in cfg.model:
        # the CPL config (main_i3d_cpl.json) and CCA use hybrid schemas
        assert "MODEL" in cfg or "others" in cfg or "cpl" in str(cfg.to_dict()).lower()
        return
    name = cfg.model.name
    get_model_entry("SeqPAN")  # ensure zoo imported
    assert name in MODEL_REGISTRY, f"{os.path.basename(path)} wants unregistered model {name}"
    # core schema fields our trainer needs
    assert "train" in cfg and "lr" in cfg.train
    assert "vlen" in cfg.model
