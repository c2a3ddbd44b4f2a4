"""bf16 compute-policy purity: under ``train.compute_dtype: bfloat16`` every
matmul/conv in the model forward must actually run in bf16.

Round 3 found that a single hardcoded f32 leaf (WordEmbedding's pad row)
silently promoted 88 of the headline eval program's 126 matmuls back to f32
— the "bf16" benchmark had never measured a bf16 program.  jnp's silent
dtype promotion makes this failure mode trivially easy to reintroduce, so
this test lowers each zoo family's eval forward under the policy cast
(ops/precision.py) and asserts the StableHLO contains no f32 dot_general or
convolution.  (Reductions/normalizations MAY run f32 — XLA upcasts those
internally regardless; only the MXU ops are asserted.)
"""

import os
import re

import jax
import jax.numpy as jnp
import pytest

from vmrframe_tpu.config import Derived, load_config
from vmrframe_tpu.data.batcher import Batcher
from vmrframe_tpu.ops.precision import cast_floating
from vmrframe_tpu.registry import get_model_entry
from vmrframe_tpu.testing import make_synthetic_data
from vmrframe_tpu.train.trainer import Trainer

CONFIGS = os.path.join(os.path.dirname(__file__), "configs")

ZOO = {
    "SeqPAN": "charades_seqpan.yaml",
    "BAN": "charades_ban.json",
    "CCA": "anet_cca.yaml",
    "ActionFormer": "charades_actionformer.yaml",
    "CPL": None,  # charades cfg + CPL updates
}


def _cfg(name, charades_cfg):
    if ZOO[name]:
        return load_config(os.path.join(CONFIGS, ZOO[name]))
    return charades_cfg.updated({
        "model.name": "CPL",
        "others": {"cpl_num_props": 4, "cpl_div_lambda": 0.15,
                   "cpl_div_loss_alhpa": 1.0},
    })


def _f32_mxu_ops(stablehlo: str):
    """Lines whose dot_general/convolution RESULT type is f32.

    Rank<=1 results are exempt: those are param-only bias compositions
    (e.g. the fused gate chain's ``bias @ kernel`` in layers/attention.py
    :204-207) that the vector-param policy deliberately keeps f32 — they
    are loop-invariant (hoisted out of serving loops) and never touch
    activation-sized MXU tiles.
    """
    bad = []
    for ln in stablehlo.splitlines():
        if "stablehlo.dot_general" not in ln and "stablehlo.convolution" not in ln:
            continue
        # result type is the part after the final '->'
        tail = ln.rsplit("->", 1)[-1]
        m = re.search(r"tensor<([0-9x]*)f32>", tail)
        if m and m.group(1).count("x") >= 2:  # rank >= 2 (e.g. "16x48x128x")
            bad.append(ln.strip()[:160])
    return bad


@pytest.mark.parametrize("name", list(ZOO))
def test_bf16_policy_no_f32_matmuls(name, charades_cfg):
    cfg = _cfg(name, charades_cfg)
    B = int(cfg.train.batch_size)
    dataset, store = make_synthetic_data(cfg, seed=0, n_train=B, n_test=B)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=2, steps_per_epoch=1)
    entry = get_model_entry(cfg.model.name)
    batcher_cls = entry.batcher_cls or Batcher
    test_b = batcher_cls(dataset["test_set"], store, cfg, derived, "test")
    trainer = Trainer(cfg, derived, dataset["word_vector"])
    state = trainer.init_state(jax.random.PRNGKey(0), next(test_b.epoch(seed=0)))
    batch = next(test_b.epoch(seed=0))

    model = trainer.model
    vb = cast_floating({"params": state.params, **state.constants}, jnp.bfloat16)
    bb = cast_floating(batch, jnp.bfloat16)
    txt = jax.jit(lambda v, b: model.apply(v, b, True)).lower(vb, bb).as_text()
    bad = _f32_mxu_ops(txt)
    assert not bad, (
        f"{name}: {len(bad)} f32 MXU ops under the bf16 policy (dtype "
        f"promotion leak — see ops/precision.py):\n" + "\n".join(bad[:8])
    )
