"""The shipped long-video config (configs/tacos_actionformer_long.yaml):
parses, targets the banded-kernel regime, and a scaled-down twin trains.
On-chip numbers for the full config live in docs/BENCH_AF_LONG.json."""

import os

import jax
import numpy as np

from vmrframe_tpu.config import Derived, load_config
from vmrframe_tpu.testing import make_synthetic_data
from vmrframe_tpu.train.trainer import Trainer

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
CFG = os.path.join(REPO, "configs", "tacos_actionformer_long.yaml")


def test_long_config_parses_and_gates_kernel():
    cfg = load_config(CFG)
    af = cfg.actionformer
    assert int(af.max_seq_len) == 2304 and int(af.n_mha_win_size) == 19

    from vmrframe_tpu.layers.actionformer import MaskedMHCA

    m = MaskedMHCA(af.embd_dim, af.n_head, window_size=int(af.n_mha_win_size),
                   pallas_min_len=int(af.pallas_min_len), pallas_interpret=True)
    # pyramid levels: 2304 (stem), 1152, 576 use the kernel; 288+ fall back
    for T, want in [(2304, True), (1152, True), (576, True), (288, False), (144, False)]:
        assert m._use_banded_kernel(T, T, True) is want, T


def test_long_config_scaled_twin_trains():
    """Same schema/window at CPU-feasible dims (T=512 still gates the
    kernel at threshold 256; interpret mode exercises the Pallas path
    inside a real train+eval cycle)."""
    cfg = load_config(CFG).updated({
        "model.vlen": 512, "model.vdim": 32, "model.dim": 32,
        "actionformer.input_dim": 32, "actionformer.embd_dim": 32,
        "actionformer.fpn_dim": 32, "actionformer.head_dim": 32,
        "actionformer.max_seq_len": 512,
        "actionformer.backbone_arch": [1, 1, 2],
        "actionformer.regression_range": [[0, 4], [4, 8], [8, 10000]],
        "actionformer.pallas_min_len": -1,  # CPU: XLA band path
        "train.batch_size": 8,  # divisible by the 8-device test mesh
    })
    dataset, store = make_synthetic_data(cfg, seed=0, n_train=8, n_test=8)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=4, steps_per_epoch=2)
    from vmrframe_tpu.data.af_batcher import ActionFormerBatcher

    train_b = ActionFormerBatcher(dataset["train_set"], store, cfg, derived, "train")
    test_b = ActionFormerBatcher(dataset["test_set"], store, cfg, derived, "test")
    trainer = Trainer(cfg, derived, dataset["word_vector"])
    state = trainer.init_state(jax.random.PRNGKey(0), next(train_b.epoch(seed=0)))
    step = trainer.compiled_train_step()
    for batch in train_b.epoch(seed=0):
        state, m = step(state, trainer._shard_batch(batch), jax.random.PRNGKey(1))
        assert np.isfinite(float(m["loss"]))
    ious, _, _ = trainer.run_eval_epoch(state, test_b.epoch(seed=0))
    assert len(ious) == 8
