"""Component-cost profile of the SeqPAN eval step on the real chip.

Times each block standalone (own params, bench dims, bf16 like bench.py) with
the fori-loop + byte-fetch protocol, plus the full model, so optimization
targets come from data: where does the 0.87 ms/batch actually go?

Isolated-block times ignore cross-block fusion, so the sum can exceed the
full-model time — read the RANKING, not the absolute split.

Writes docs/PROFILE_SEQPAN.json.
Usage: python -m vmrframe_tpu.tools.profile_seqpan [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def _timed(step, args, n_small=50, n_big=450, reps=3):
    import jax
    import jax.numpy as jnp

    def make(n):
        @jax.jit
        def loop(*args):
            def body(i, tok):
                out = step(tok, *args)
                if isinstance(out, (tuple, list)):
                    out = out[0]
                return jnp.sum(jnp.ravel(out)[:1].astype(jnp.float32))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return loop

    def t(n):
        fn = make(n)
        np.asarray(fn(*args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(n_big) - t(n_small)) / (n_big - n_small)


def _timed_chain(make_body, init_carry, args, n_small=20, n_big=120, reps=3):
    """Like _timed but for stateful bodies: carry chains through the loop and
    the returned scalar depends on the final carry (defeats DCE)."""
    import jax
    import jax.numpy as jnp

    def make(n):
        @jax.jit
        def loop(carry, *a):
            out = jax.lax.fori_loop(0, n, lambda i, c: make_body(i, c, *a), carry)
            leaves = [x for x in jax.tree_util.tree_leaves(out)
                      if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)]
            return sum(jnp.sum(jnp.ravel(l)[:1].astype(jnp.float32)) for l in leaves[:4])
        return loop

    def t(n):
        fn = make(n)
        np.asarray(fn(init_carry, *args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(init_carry, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(n_big) - t(n_small)) / (n_big - n_small)


def profile_train(out_path):
    """Decompose the train step: loss value, +grad, full step (opt+infer+IoU),
    at the bench config's shipped dims (f32, matching docs/BENCH_ZOO.json)."""
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from vmrframe_tpu.train.trainer import Trainer

    B = 128
    cfg = ge._make_cfg(batch_size=B)
    model, entry, derived, batch, word_vectors = ge._build(cfg, batch_size=B)
    trainer = Trainer(cfg, derived, word_vectors)
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, batch)
    db = trainer._shard_batch(batch)
    results = {}

    def perturb(b, i, tok):
        b = dict(b)
        b["vfeats"] = b["vfeats"] + (tok * 1e-9 + i * 0.0).astype(b["vfeats"].dtype)
        return b

    def make_loss_fn(b):
        def loss_fn(params):
            variables = trainer._cast_for_compute({"params": params, **state.constants})
            cb = trainer._cast_for_compute(b)
            rngs = {"dropout": jax.random.PRNGKey(1), "gumbel": jax.random.PRNGKey(2)}
            outputs = model.apply(variables, cb, False, rngs=rngs)
            outputs = trainer._upcast_outputs(outputs)
            return entry.loss_fn(outputs, b, cfg), outputs
        return loss_fn

    def body_loss(i, tok, b):
        b = perturb(b, i, tok)
        (loss, _) = make_loss_fn(b)(state.params)[0], None
        return tok + loss

    results["loss_value_train_mode"] = round(
        _timed_chain(body_loss, jnp.float32(0.0), (db,)) * 1e3, 3)
    print({"loss_value_train_mode": results["loss_value_train_mode"]}, flush=True)

    def body_grad(i, tok, b):
        b = perturb(b, i, tok)
        (loss, _), grads = jax.value_and_grad(
            lambda p: make_loss_fn(b)(p), has_aux=True)(state.params)
        g0 = jax.tree_util.tree_leaves(grads)[0]
        return tok + loss + jnp.sum(g0.astype(jnp.float32)) * 1e-9

    results["loss_and_grad"] = round(
        _timed_chain(body_grad, jnp.float32(0.0), (db,)) * 1e3, 3)
    print({"loss_and_grad": results["loss_and_grad"]}, flush=True)

    # same as loss_and_grad but with per-iteration dropout keys (the real
    # step folds rng with state.step — constant keys let XLA hoist the mask
    # generation out of the loop, undercounting it)
    def make_loss_fn_rng(b, key):
        def loss_fn(params):
            variables = trainer._cast_for_compute({"params": params, **state.constants})
            cb = trainer._cast_for_compute(b)
            d, g = jax.random.split(key)
            outputs = model.apply(variables, cb, False,
                                  rngs={"dropout": d, "gumbel": g})
            outputs = trainer._upcast_outputs(outputs)
            return entry.loss_fn(outputs, b, cfg), outputs
        return loss_fn

    def body_grad_rng(i, tok, b):
        b = perturb(b, i, tok)
        key = jax.random.fold_in(jax.random.PRNGKey(3), i)
        (loss, _), grads = jax.value_and_grad(
            lambda p: make_loss_fn_rng(b, key)(p), has_aux=True)(state.params)
        g0 = jax.tree_util.tree_leaves(grads)[0]
        return tok + loss + jnp.sum(g0.astype(jnp.float32)) * 1e-9

    results["loss_and_grad_fresh_rng"] = round(
        _timed_chain(body_grad_rng, jnp.float32(0.0), (db,)) * 1e3, 3)
    print({"loss_and_grad_fresh_rng": results["loss_and_grad_fresh_rng"]}, flush=True)

    # + clip/AdamW/schedule (chained params+opt, still no infer/IoU)
    def body_grad_opt(i, carry, b):
        params, opt_state = carry
        b = perturb(b, i, jnp.float32(i))
        key = jax.random.fold_in(jax.random.PRNGKey(3), i)
        (_, _), grads = jax.value_and_grad(
            lambda p: make_loss_fn_rng(b, key)(p), has_aux=True)(params)
        updates, opt_state = trainer.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    import optax

    results["grad_plus_optimizer"] = round(
        _timed_chain(body_grad_opt, (state.params, state.opt_state), (db,)) * 1e3, 3)
    print({"grad_plus_optimizer": results["grad_plus_optimizer"]}, flush=True)

    def body_full(i, st, b, r):
        st2, _ = trainer._train_step(st, perturb(b, i, jnp.float32(i)), r)
        return st2

    results["full_train_step"] = round(
        _timed_chain(body_full, state, (db, rng)) * 1e3, 3)
    print({"full_train_step": results["full_train_step"]}, flush=True)

    with open(out_path, "w") as f:
        json.dump({"device": str(jax.devices()[0]), "batch": B,
                   "dtype": "f32 (shipped config)", "ms": results}, f, indent=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--train", action="store_true",
                    help="profile the train step instead of eval components")
    ap.add_argument("--grad", action="store_true",
                    help="per-block fwd+bwd timings (value_and_grad per block)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--batch", type=int, default=128,
                    help="eval-profile batch size (per-block batch scaling)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.train:
        profile_train(args.out or os.path.join(REPO, "docs", "PROFILE_SEQPAN_TRAIN.json"))
        return
    suffix = "" if args.batch == 128 else f"_B{args.batch}"
    args.out = args.out or os.path.join(
        REPO, "docs",
        ("PROFILE_SEQPAN_GRAD.json" if args.grad else f"PROFILE_SEQPAN{suffix}.json"))

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from vmrframe_tpu.layers import SeqPANPredictor
    from vmrframe_tpu.layers.attention import CQAttention, CQConcatenate, DualAttentionBlock
    from vmrframe_tpu.layers.basic import Embedding, FeatureEncoder, VisualProjection
    from vmrframe_tpu.ops.span import infer_span_1d

    B = args.batch
    cfg = ge._make_cfg(batch_size=B)
    model, entry, derived, batch, word_vectors = ge._build(cfg, batch_size=B)
    m = cfg.model
    dim, L, T = m.dim, m.vlen, m.tlen
    bf = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    rngs = {"params": rng, "dropout": rng, "gumbel": rng}

    def cast(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(bf)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

    dev = jax.devices()[0]
    batch = cast(jax.device_put(batch, dev))
    vmask, tmask = batch["vmasks"], batch["tmasks"]
    vfeat = jax.random.normal(rng, (B, L, dim), bf)
    tfeat = jax.random.normal(rng, (B, T, dim), bf)
    fuse = jax.random.normal(rng, (B, L, dim), bf)
    slog = jax.random.normal(rng, (B, L), jnp.float32)

    results = {}

    def bench(name, module, call):
        params = cast(module.init(rngs, *call(jnp.float32(0.0))))

        if args.grad:
            def step(tok, params):
                def scalar(p):
                    out = module.apply(p, *call(tok))
                    if isinstance(out, (tuple, list)):
                        out = out[0]
                    return jnp.sum(out.astype(jnp.float32))
                loss, grads = jax.value_and_grad(scalar)(params)
                g = jax.tree_util.tree_leaves(grads)
                # full-sum every grad leaf (slicing here can legalize into an
                # invalid 1-feature batch-group conv for depthwise filter
                # grads — a Mosaic/XLA lowering bug observed on v5e)
                return loss + sum(jnp.sum(x.astype(jnp.float32)) for x in g) * 1e-9
        else:
            def step(tok, params):
                return module.apply(params, *call(tok))
        results[name] = round(_timed(step, (params,)) * 1e3, 4)
        print(json.dumps({name: results[name]}), flush=True)

    emb = Embedding(out_dim=dim, word_dim=m.word_dim, char_dim=m.char_dim,
                    num_chars=derived.num_chars, word_vectors=word_vectors, droprate=0.0)
    bench("embedding_text", emb,
          lambda tok: (batch["words_ids"], batch["char_ids"], True))
    bench("visual_projection", VisualProjection(dim, 0.0),
          lambda tok: (batch["vfeats"] + tok.astype(bf), True))
    bench("feature_encoder_video", FeatureEncoder(dim, max_pos_len=L, kernel_size=7,
                                                  num_layers=4, droprate=0.0),
          lambda tok: (vfeat + tok.astype(bf), True))
    bench("feature_encoder_text", FeatureEncoder(dim, max_pos_len=L, kernel_size=7,
                                                 num_layers=4, droprate=0.0),
          lambda tok: (tfeat + tok.astype(bf), True))
    bench("dual_attention_block_v", DualAttentionBlock(dim, m.num_heads, 0.0),
          lambda tok: (vfeat + tok.astype(bf), tfeat, vmask, tmask, True))
    bench("cq_attention", CQAttention(dim, 0.0),
          lambda tok: (vfeat + tok.astype(bf), tfeat, vmask, tmask, True))
    bench("cq_concat", CQConcatenate(dim),
          lambda tok: (fuse + tok.astype(bf), tfeat, tmask))
    bench("predictor", SeqPANPredictor(dim, L, num_heads=4, droprate=0.0),
          lambda tok: (fuse + tok.astype(bf), vmask, True))

    # the composite pieces bench.py times
    variables = cast(model.init(rngs, batch, True))

    def full_fwd(tok, variables):
        b = dict(batch)
        b["vfeats"] = batch["vfeats"] + tok.astype(bf)
        return model.apply(variables, b, True)["slogits"]
    results["full_forward"] = round(_timed(full_fwd, (variables,)) * 1e3, 4)
    print(json.dumps({"full_forward": results["full_forward"]}), flush=True)

    def infer_only(tok, s):
        props = infer_span_1d(s + tok, s * 0.5, vmask.astype(jnp.float32))
        return props
    results["infer_span"] = round(_timed(infer_only, (slog,)) * 1e3, 4)
    print(json.dumps({"infer_span": results["infer_span"]}), flush=True)

    blocks = ["embedding_text", "visual_projection",
              "feature_encoder_video", "feature_encoder_text",
              "dual_attention_block_v", "cq_attention", "cq_concat", "predictor"]
    # dual attention runs 4x (2 blocks x 2 directions), CQ twice
    results["sum_weighted_blocks"] = round(
        sum(results[b] for b in blocks)
        + 3 * results["dual_attention_block_v"] + results["cq_attention"], 4)
    with open(args.out, "w") as f:
        json.dump({"device": str(jax.devices()[0]), "batch": B, "ms": results}, f, indent=2)
    print(json.dumps({"sum_weighted_blocks": results["sum_weighted_blocks"]}))


if __name__ == "__main__":
    main()
