"""Pallas kernel vs XLA microbenchmarks on the real chip.

Measures, with the byte-fetch barrier protocol (chained fori_loop, two loop
lengths differenced):

1. fused_dual_attention vs the XLA einsum path at SeqPAN dims
   (Charades L=64 and TACoS L=256);
2. banded_attention (sliding window) vs the XLA full-matrix band mask at
   T in {512, 1024, 2304}, window 19 (the long-sequence regime);
3. fused CQAttention vs the XLA path at L=64/256.

Writes docs/BENCH_KERNELS.json.  The measured winners drive the auto-enable
thresholds in layers/attention.py and layers/actionformer.py.

Usage: python -m vmrframe_tpu.tools.bench_kernels [--cpu]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def _timed_loop(step, args, n_small=20, n_big=120, reps=3):
    import jax
    import jax.numpy as jnp

    def make(n):
        @jax.jit
        def loop(*args):
            def body(i, tok):
                out = step(tok, *args)
                return jnp.sum(out[..., :1]).astype(jnp.float32)
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


def bench_dual_attention(B, H, L, M, hd):
    import jax
    import jax.numpy as jnp

    from vmrframe_tpu.kernels.attention import fused_dual_attention

    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    q, fk, fv = mk(B, H, L, hd), mk(B, H, L, hd), mk(B, H, L, hd)
    tk, tv = mk(B, H, M, hd), mk(B, H, M, hd)
    smask = jnp.ones((B, L, L), jnp.float32)
    xmask = jnp.ones((B, L, M), jnp.float32)
    scale = 1.0 / math.sqrt(hd)

    def xla_step(tok, q, fk, fv, tk, tv):
        qq = q + tok * 1e-9
        s_scores = jnp.einsum("bhld,bhmd->bhlm", qq, fk) * scale
        s_scores = s_scores + (1.0 - smask[:, None]) * -1e30
        s_p = jax.nn.softmax(s_scores, axis=-1)
        x_scores = jnp.einsum("bhld,bhmd->bhlm", qq, tk) * scale
        x_scores = x_scores + (1.0 - xmask[:, None]) * -1e30
        x_p = jax.nn.softmax(x_scores, axis=-1)
        s = jnp.einsum("bhlm,bhmd->bhld", s_p, fv)
        x = jnp.einsum("bhlm,bhmd->bhld", x_p, tv)
        return s + x

    def pallas_step(tok, q, fk, fv, tk, tv):
        s, x = fused_dual_attention(q + tok * 1e-9, fk, fv, tk, tv, smask, xmask)
        return s + x

    args = (q, fk, fv, tk, tv)
    return {"xla_ms": round(_timed_loop(xla_step, args) * 1e3, 4),
            "pallas_ms": round(_timed_loop(pallas_step, args) * 1e3, 4)}


def bench_banded(B, H, T, hd, window):
    import jax
    import jax.numpy as jnp

    from vmrframe_tpu.kernels.window_attention import banded_attention

    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    q, k, v = mk(B, H, T, hd), mk(B, H, T, hd), mk(B, H, T, hd)
    kv_mask = jnp.ones((B, T), jnp.float32)
    half = window // 2
    qi = jnp.arange(T)[:, None]
    kj = jnp.arange(T)[None, :]
    band = (jnp.abs(qi - kj) <= half)[None, None]

    def xla_step(tok, q, k, v):
        att = jnp.einsum("bhqd,bhkd->bhqk", (q + tok * 1e-9) / math.sqrt(hd), k)
        neg = jnp.finfo(att.dtype).min
        att = jnp.where(kv_mask[:, None, None, :] > 0, att, neg)
        att = jnp.where(band, att, neg)
        p = jax.nn.softmax(att, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    def pallas_step(tok, q, k, v):
        return banded_attention(q + tok * 1e-9, k, v, kv_mask, window)

    args = (q, k, v)
    n_small, n_big = (10, 40) if T >= 2048 else (20, 120)
    return {"xla_ms": round(_timed_loop(xla_step, args, n_small, n_big) * 1e3, 4),
            "pallas_ms": round(_timed_loop(pallas_step, args, n_small, n_big) * 1e3, 4)}


def bench_cq(B, Lc, Lq, D):
    import jax
    import jax.numpy as jnp

    from vmrframe_tpu.kernels.attention import fused_cq_attention

    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    c, q = mk(B, Lc, D), mk(B, Lq, D)
    w4C, w4Q, w4m = mk(D, 1), mk(D, 1), mk(1, 1, D)
    cmask = jnp.ones((B, Lc), jnp.float32)
    qmask = jnp.ones((B, Lq), jnp.float32)

    def xla_step(tok, c, q):
        cc = c + tok * 1e-9
        s0 = jnp.matmul(cc, w4C)
        s1 = jnp.matmul(q, w4Q).transpose(0, 2, 1)
        s2 = jnp.einsum("bld,bmd->blm", cc * w4m, q)
        score = s0 + s1 + s2
        s_ = jax.nn.softmax(score + (1.0 - qmask[:, None, :]) * -1e30, axis=2)
        s_t = jax.nn.softmax(score + (1.0 - cmask[:, :, None]) * -1e30, axis=1).transpose(0, 2, 1)
        c2q = jnp.matmul(s_, q)
        q2c = jnp.matmul(jnp.matmul(s_, s_t), cc)
        return c2q + q2c

    def pallas_step(tok, c, q):
        c2q, q2c = fused_cq_attention(c + tok * 1e-9, q, w4C, w4Q, w4m, cmask, qmask)
        return c2q + q2c

    args = (c, q)
    return {"xla_ms": round(_timed_loop(xla_step, args) * 1e3, 4),
            "pallas_ms": round(_timed_loop(pallas_step, args) * 1e3, 4)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "BENCH_KERNELS.json"))
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    results = {}
    for name, fn in [
        ("dual_attention_charades_B128_H4_L64_hd32", lambda: bench_dual_attention(128, 4, 64, 20, 32)),
        ("dual_attention_tacos_B64_H8_L256_hd16", lambda: bench_dual_attention(64, 8, 256, 30, 16)),
        ("banded_T512_w19_B8_H16_hd32", lambda: bench_banded(8, 16, 512, 32, 19)),
        ("banded_T1024_w19_B8_H16_hd32", lambda: bench_banded(8, 16, 1024, 32, 19)),
        ("banded_T2304_w19_B2_H16_hd32", lambda: bench_banded(2, 16, 2304, 32, 19)),
        ("cq_attention_charades_B128_L64_D128", lambda: bench_cq(128, 64, 20, 128)),
        ("cq_attention_tacos_B64_L256_D128", lambda: bench_cq(64, 256, 30, 128)),
    ]:
        try:
            r = fn()
            r["speedup"] = round(r["xla_ms"] / r["pallas_ms"], 2)
        except Exception as e:
            r = {"error": f"{type(e).__name__}: {e}"}
        results[name] = r
        print(json.dumps({name: r}))

    import jax

    with open(args.out, "w") as f:
        json.dump({"device": str(jax.devices()[0]), "results": results}, f, indent=2)


if __name__ == "__main__":
    main()
