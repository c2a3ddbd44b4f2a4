import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmrframe_tpu.config import Derived, load_config
from vmrframe_tpu.data.ban_batcher import BANBatcher
from vmrframe_tpu.data.labels import mask2d as build_mask2d
from vmrframe_tpu.testing import make_synthetic_data
from vmrframe_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def ban_cfg():
    return load_config(os.path.join(os.path.dirname(__file__), "configs", "charades_ban.json"))


def test_lstm_matches_torch_packed():
    """Masked scan LSTM == torch packed bidirectional LSTM."""
    torch = pytest.importorskip("torch")
    from vmrframe_tpu.layers.recurrent import LSTM

    rng = np.random.default_rng(0)
    B, T, D, H = 3, 10, 6, 8
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    lengths = np.array([10, 7, 4])

    mod = LSTM(hidden_dim=H, num_layers=1, bidirectional=True)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(lengths))
    out = np.asarray(mod.apply(params, jnp.asarray(x), jnp.asarray(lengths)))

    t_lstm = torch.nn.LSTM(D, H, 1, batch_first=True, bidirectional=True)
    sd = {}
    p = params["params"]
    sd["weight_ih_l0"] = torch.tensor(np.asarray(p["w_ih_l0"]))
    sd["weight_hh_l0"] = torch.tensor(np.asarray(p["w_hh_l0"]))
    sd["bias_ih_l0"] = torch.tensor(np.asarray(p["b_ih_l0"]))
    sd["bias_hh_l0"] = torch.tensor(np.asarray(p["b_hh_l0"]))
    sd["weight_ih_l0_reverse"] = torch.tensor(np.asarray(p["w_ih_l0_reverse"]))
    sd["weight_hh_l0_reverse"] = torch.tensor(np.asarray(p["w_hh_l0_reverse"]))
    sd["bias_ih_l0_reverse"] = torch.tensor(np.asarray(p["b_ih_l0_reverse"]))
    sd["bias_hh_l0_reverse"] = torch.tensor(np.asarray(p["b_hh_l0_reverse"]))
    t_lstm.load_state_dict(sd)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.tensor(x), lengths, batch_first=True, enforce_sorted=False)
    t_out, _ = t_lstm(packed)
    t_out, _ = torch.nn.utils.rnn.pad_packed_sequence(t_out, batch_first=True, total_length=T)
    np.testing.assert_allclose(out, t_out.detach().numpy(), atol=1e-5)


def test_segment_max_map_values():
    from vmrframe_tpu.models.ban import _mask_meta, segment_max_map

    rng = np.random.default_rng(0)
    L, D = 16, 4
    x = rng.standard_normal((1, L, D)).astype(np.float32)
    mask_np, offsets, ii, jj = _mask_meta([4, 2, 2], L)
    m = np.asarray(segment_max_map(jnp.asarray(x), list(offsets)))
    for i, j in zip(ii, jj):
        np.testing.assert_allclose(m[0, i, j], x[0, i : j + 1].max(axis=0), atol=1e-6,
                                   err_msg=f"cell ({i},{j})")


def test_proposal_selection_properties():
    from vmrframe_tpu.models.ban import proposal_selection

    rng = np.random.default_rng(0)
    K = 50
    moments = np.zeros((K, 2), dtype=np.float32)
    moments[:, 0] = rng.integers(0, 10, K)
    moments[:, 1] = moments[:, 0] + rng.integers(1, 8, K)
    scores = rng.random(K).astype(np.float32)
    topk, neighbor, negative = 4, 2, 0
    idx = np.asarray(proposal_selection(jnp.asarray(scores), jnp.asarray(moments),
                                        topk=topk, neighbor=neighbor, negative=negative, thresh=0.7))
    assert idx.shape == (topk * (neighbor + 1),)
    assert np.unique(idx).size == idx.size  # no duplicates
    # the global argmax is always selected
    assert int(np.argmax(scores)) in idx


def test_ban_trains_and_evals(ban_cfg):
    dataset, store = make_synthetic_data(ban_cfg, seed=0, n_train=16, n_test=8)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=4, steps_per_epoch=2)
    train_b = BANBatcher(dataset["train_set"], store, ban_cfg, derived, "train")
    test_b = BANBatcher(dataset["test_set"], store, ban_cfg, derived, "test")
    trainer = Trainer(ban_cfg, derived, dataset["word_vector"])
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, next(train_b.epoch(seed=0)))
    step = trainer.compiled_train_step()
    for batch in train_b.epoch(seed=0):
        state, m = step(state, trainer._shard_batch(batch), rng)
        assert np.isfinite(float(m["loss"])), "BAN loss not finite"
    ious1, _, _ = trainer.run_eval_epoch(state, test_b.epoch(seed=0))
    ious2, _, _ = trainer.run_eval_epoch(state, test_b.epoch(seed=0))
    np.testing.assert_allclose(ious1, ious2, atol=1e-6)


def _ban_loss_and_grads(cfg, dataset, store, compact: bool):
    import jax
    import jax.numpy as jnp

    from vmrframe_tpu.config import Derived
    from vmrframe_tpu.registry import get_model_entry

    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=2, steps_per_epoch=1)
    entry = get_model_entry("BAN")
    batcher = entry.batcher_cls(dataset["train_set"], store, cfg, derived, "train")
    batch = next(batcher.epoch(seed=0, shuffle=False))
    cfg_v = cfg.updated({"model.compact_map": compact})
    model = entry.model_cls(cfg_v, derived, dataset["word_vector"])
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, batch, True)

    def loss_fn(params):
        outputs = model.apply({**variables, "params": params}, batch, True)
        return entry.loss_fn(outputs, batch, cfg_v)

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    return float(loss), grads


@pytest.mark.parametrize("config_path,shrink", [
    ("tests/configs/charades_ban.json", None),
    # the shipped long-video config's STRUCTURE (vlen 128, 2D-TAN TACoS
    # pooling [15,8,8,8] -> far sparser valid-cell fraction), tiny widths
    (os.path.join(os.path.dirname(__file__), "..", "configs", "tacos_ban_long.yaml"),
     {"model.dim": 16, "model.vdim": 24, "model.fuse_dim": 32,
      "model.contrast_dim": 16, "model.query_embed_dim": 50,
      "model.word_dim": 50, "model.char_dim": 16, "model.tlen": 8,
      "train.batch_size": 2}),
])
def test_compact_map_train_mode_loss_and_grads_match_dense(config_path, shrink):
    """TRAINING equivalence of the compact-cells map (the production
    default): the 5-term BAN loss AND every parameter gradient are equal
    compact vs dense on the same weights/batch (dropout off — with dropout
    on, both paths apply iid Bernoulli(0.1) masks per VALID cell, identical
    in distribution; they differ only in which PRNG bits land on which cell
    and in the unobserved invalid-cell constants; see models/ban.py)."""
    import numpy as np

    from vmrframe_tpu.config import load_config
    from vmrframe_tpu.testing import make_synthetic_data

    cfg = load_config(config_path)
    if shrink:
        cfg = cfg.updated(shrink)
    dataset, store = make_synthetic_data(cfg, seed=0, n_train=4, n_test=2)

    loss_c, grads_c = _ban_loss_and_grads(cfg, dataset, store, compact=True)
    loss_d, grads_d = _ban_loss_and_grads(cfg, dataset, store, compact=False)
    np.testing.assert_allclose(loss_c, loss_d, rtol=2e-5)

    import jax

    flat_c = jax.tree_util.tree_leaves_with_path(grads_c)
    flat_d = dict(jax.tree_util.tree_leaves_with_path(grads_d))
    assert len(flat_c) == len(flat_d)
    for path, g in flat_c:
        gd = flat_d[path]
        scale = max(float(np.max(np.abs(np.asarray(gd)))), 1e-6)
        # measured worst-case accumulation-order noise: 3.4e-05 normalized
        np.testing.assert_allclose(
            np.asarray(g) / scale, np.asarray(gd) / scale, atol=1.5e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_compact_map_exactly_matches_dense(charades_ban_cfg=None):
    """The compact-cells path (default) == the dense-map path in eval mode,
    cell for cell — including the bias-constant invalid cells that
    ban_infer's full-triu quirk can observe."""
    import jax
    import numpy as np

    from vmrframe_tpu.config import Derived, load_config
    from vmrframe_tpu.registry import get_model_entry
    from vmrframe_tpu.testing import make_synthetic_data

    cfg = load_config("tests/configs/charades_ban.json")
    dataset, store = make_synthetic_data(cfg, seed=0, n_train=4, n_test=4)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=2, steps_per_epoch=1)
    entry = get_model_entry("BAN")
    batcher = entry.batcher_cls(dataset["test_set"], store, cfg, derived, "test")
    batch = next(batcher.epoch(seed=0, shuffle=False))

    rng = jax.random.PRNGKey(0)
    rngs = {"params": rng, "dropout": rng}
    m_compact = entry.model_cls(cfg.updated({"model.compact_map": True}),
                                derived, dataset["word_vector"])
    variables = m_compact.init(rngs, batch, True)
    out_c = m_compact.apply(variables, batch, True)
    m_dense = entry.model_cls(cfg.updated({"model.compact_map": False}),
                              derived, dataset["word_vector"])
    out_d = m_dense.apply(variables, batch, True)

    for key in ("tmap", "final_pred", "offset", "pred_score", "coarse_pred"):
        np.testing.assert_allclose(np.asarray(out_c[key]), np.asarray(out_d[key]),
                                   atol=2e-5, rtol=2e-5, err_msg=key)

    # the compact path exports the contrast projection as cells + the
    # encoder(0) sentinel; scattering them reproduces the dense map exactly
    from vmrframe_tpu.models.ban import _mask_meta

    L = np.asarray(out_c["tmap"]).shape[-1]
    _, _, ii, jj = _mask_meta(list(cfg.model.pooling_counts), L)
    dense_view = np.broadcast_to(
        np.asarray(out_c["map2d_proj_inv"])[:, None, None, :],
        np.asarray(out_d["map2d_proj"]).shape).copy()
    dense_view[:, ii, jj] = np.asarray(out_c["map2d_proj_cells"])
    np.testing.assert_allclose(dense_view, np.asarray(out_d["map2d_proj"]),
                               atol=2e-5, rtol=2e-5, err_msg="map2d_proj")
