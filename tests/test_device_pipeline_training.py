"""End-to-end: SeqPAN training with the ON-DEVICE input pipeline
(dataprocess.device_pipeline: true) vs the host pipeline."""

import jax
import numpy as np

from vmrframe_tpu.config import Derived
from vmrframe_tpu.data.batcher import Batcher
from vmrframe_tpu.metrics import get_i345_mi
from vmrframe_tpu.testing import make_synthetic_data
from vmrframe_tpu.train.trainer import Trainer


def test_device_pipeline_trains_and_matches_host_eval(charades_cfg):
    cfg_host = charades_cfg
    cfg_dev = charades_cfg.updated({"dataprocess.device_pipeline": True})
    dataset, store = make_synthetic_data(cfg_host, seed=0, n_train=32, n_test=16)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=4, steps_per_epoch=2)

    host_b = Batcher(dataset["test_set"], store, cfg_host, derived, "test")
    dev_b = Batcher(dataset["test_set"], store, cfg_dev, derived, "test")
    assert dev_b.device_pipeline and not host_b.device_pipeline
    assert "raw_vfeats" in next(dev_b.epoch(seed=0))

    trainer = Trainer(cfg_dev, derived, dataset["word_vector"])
    rng = jax.random.PRNGKey(0)
    train_b = Batcher(dataset["train_set"], store, cfg_dev, derived, "train")
    state = trainer.init_state(rng, next(train_b.epoch(seed=0)))

    step = trainer.compiled_train_step()
    for batch in train_b.epoch(seed=0):
        state, m = step(state, trainer._shard_batch(batch), rng)
        assert np.isfinite(float(m["loss"]))

    # eval through the device pipeline == eval through the host pipeline
    # (identity augmentation path is exact)
    ious_dev, _, _ = trainer.run_eval_epoch(state, dev_b.epoch(seed=0))
    host_trainer = Trainer(cfg_host, derived, dataset["word_vector"])
    host_trainer._compiled = {}
    ious_host, _, _ = host_trainer.run_eval_epoch(state, host_b.epoch(seed=0))
    np.testing.assert_allclose(ious_dev, ious_host, atol=1e-4)
    r = get_i345_mi(ious_dev)
    assert 0 <= r[-1] <= 100
