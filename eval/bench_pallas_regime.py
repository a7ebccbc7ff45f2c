"""Does the fused Pallas galerkin kernel have a winning regime?
(VERDICT r2 next #4.)

The claim to test: the one-HBM-pass fused kernel should win where the
op's working set exceeds VMEM (~128 MB on v5e), i.e. XLA can no longer
keep LN(K), LN(V) VMEM-resident between the two matmuls.  Sweeps shapes
from the production point (n=8192, d=96) up to working sets of several
hundred MB and records blocked-XLA vs pallas times under the honest
chained harness.  Also benches the flash-tiled fourier attention at its
512 MB engagement threshold (models/layers.py:305-314).

Usage: python eval/bench_pallas_regime.py [--out eval/pallas_regime.json]
"""
import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def bench_galerkin(n, d_k, batch, n_head, iters=24):
    import jax
    import jax.numpy as jnp
    from galerkin_transformer_tpu.ops.attention import (
        galerkin_attention_pos_blocked, per_head_layer_norm)
    from galerkin_transformer_tpu.ops.pallas.galerkin import \
        galerkin_attention_fused
    from galerkin_transformer_tpu.utils.profiling import measure

    ks = jax.random.split(jax.random.key(0), 3)
    shape = (batch, n_head, n, d_k)
    q = jax.random.normal(ks[0], shape, jnp.float32)
    k = jax.random.normal(ks[1], shape, jnp.float32)
    v = jax.random.normal(ks[2], shape, jnp.float32)
    pos = jnp.linspace(0, 1, n, dtype=jnp.float32)[None, :, None]
    pos = jnp.broadcast_to(pos, (batch, n, 1))
    sk = jnp.ones((n_head, d_k), jnp.float32)
    bk = jnp.zeros((n_head, d_k), jnp.float32)

    def blocked(q, k, v):
        kn = per_head_layer_norm(k, sk, bk)
        vn = per_head_layer_norm(v, sk, bk)
        return galerkin_attention_pos_blocked(q, kn, vn, pos)[0]

    def pallas(q, k, v):
        return galerkin_attention_fused(
            q, k, v, pos, sk, bk, sk, bk,
            interpret=jax.default_backend() != "tpu")[0]

    ws_mb = 3 * batch * n_head * n * d_k * 4 / 2**20
    row = dict(n=n, d_k=d_k, batch=batch, n_head=n_head,
               working_set_mb=round(ws_mb, 1))
    for name, fn in (("blocked", blocked), ("pallas", pallas)):
        try:
            dt = measure(fn, q, k, v, iters=iters, iters_lo=iters // 3)
            row[f"{name}_fwd_ms"] = round(dt * 1e3, 4)
        except Exception as e:
            row[f"{name}_error"] = repr(e)[:200]

        def fwdbwd(q, k, v, fn=fn):
            return jax.grad(lambda *a: fn(*a).sum(), argnums=(0, 1, 2))(
                q, k, v)
        try:
            dt = measure(fwdbwd, q, k, v, iters=iters, iters_lo=iters // 3)
            row[f"{name}_fwdbwd_ms"] = round(dt * 1e3, 4)
        except Exception as e:
            row.setdefault(f"{name}_error", repr(e)[:200])
    if "blocked_fwd_ms" in row and "pallas_fwd_ms" in row:
        row["pallas_vs_blocked_fwd"] = round(
            row["pallas_fwd_ms"] / row["blocked_fwd_ms"], 3)
    return row


def bench_fourier_tiled(n, d_k, batch, n_head, iters=12):
    """Flash-tiled fourier (softmax-free n×n form) vs unfused, near the
    512 MB dense-score engagement threshold."""
    import jax
    import jax.numpy as jnp
    from galerkin_transformer_tpu.ops.attention import fourier_attention
    from galerkin_transformer_tpu.ops.pallas.fourier import \
        fourier_attention_tiled
    from galerkin_transformer_tpu.utils.profiling import measure

    ks = jax.random.split(jax.random.key(1), 3)
    shape = (batch, n_head, n, d_k)
    q = jax.random.normal(ks[0], shape, jnp.float32)
    k = jax.random.normal(ks[1], shape, jnp.float32)
    v = jax.random.normal(ks[2], shape, jnp.float32)
    score_mb = batch * n_head * n * n * 4 / 2**20
    row = dict(n=n, d_k=d_k, batch=batch, n_head=n_head,
               dense_scores_mb=round(score_mb, 1))
    for name, fn in (("dense", lambda a, b, c: fourier_attention(a, b, c)[0]),
                     ("tiled", lambda a, b, c: fourier_attention_tiled(
                         a, b, c,
                         interpret=jax.default_backend() != "tpu"))):
        try:
            dt = measure(fn, q, k, v, iters=iters, iters_lo=iters // 3)
            row[f"{name}_fwd_ms"] = round(dt * 1e3, 4)
        except Exception as e:
            row[f"{name}_error"] = repr(e)[:200]
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str,
                    default=os.path.join(REPO, "eval", "pallas_regime.json"))
    args = ap.parse_args()
    import jax
    from galerkin_transformer_tpu.utils.jax_setup import setup
    setup()

    report = dict(backend=jax.default_backend(),
                  device=jax.devices()[0].device_kind,
                  galerkin=[], fourier=[])
    # production point -> beyond-VMEM working sets
    for (n, d_k, b, h) in [(8192, 96, 8, 1),      # production (37 MB)
                           (32768, 96, 8, 1),     # 288 MB
                           (8192, 256, 8, 1),     # 192 MB
                           (32768, 256, 4, 1),    # 384 MB
                           (65536, 128, 4, 1),    # 384 MB, long-n
                           (131072, 96, 2, 1)]:   # 288 MB, very long n
        row = bench_galerkin(n, d_k, b, h)
        report["galerkin"].append(row)
        print(json.dumps(row), flush=True)
    for (n, d_k, b, h) in [(4096, 64, 8, 4),      # 2 GB dense scores
                           (8192, 64, 2, 4)]:     # 2 GB dense scores
        row = bench_fourier_tiled(n, d_k, b, h)
        report["fourier"].append(row)
        print(json.dumps(row), flush=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
