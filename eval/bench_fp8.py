"""fp8 projection-matmul experiment (VERDICT r2 next #10, ROADMAP stretch).

Question: do fp8 (e4m3/e5m2) storage/compute dtypes buy anything on this
chip for the galerkin projection matmuls (n×d @ d×d), which are
bandwidth-bound at d=96?

TPU v5e has no fp8 MXU path (native fp8 arrives with v6e) — XLA will
upcast fp8 operands; the possible win is HBM traffic on the activation
stream (n×d bytes halve vs bf16).  This harness measures, honestly:

  * bf16 / f32 / fp8-stored+bf16-compute projection matmul times at the
    ex1 shape and a 16x longer sequence,
  * numerical error of fp8 storage vs f32 reference on unit-scale data.

Records pass or fail as found (a negative result is a result —
PERFORMANCE.md gets one row either way).
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def bench_one(n, d, batch, iters=30):
    import jax
    import jax.numpy as jnp
    from galerkin_transformer_tpu.utils.profiling import measure

    x32 = jax.random.normal(jax.random.key(0), (batch, n, d), jnp.float32)
    w32 = jax.random.normal(jax.random.key(1), (d, d), jnp.float32) / d**0.5
    row = dict(n=n, d=d, batch=batch)

    def mm(dtype_x, dtype_w, accum=jnp.float32):
        x = x32.astype(dtype_x)
        w = w32.astype(dtype_w)

        def f(x, w):
            return jnp.matmul(x, w, preferred_element_type=accum)
        return f, x, w

    for name, (dx, dw) in {
        "f32": (jnp.float32, jnp.float32),
        "bf16": (jnp.bfloat16, jnp.bfloat16),
    }.items():
        f, x, w = mm(dx, dw)
        dt = measure(f, x, w, iters=iters, iters_lo=iters // 3)
        row[f"{name}_ms"] = round(dt * 1e3, 4)

    # fp8 storage, bf16 compute: cast-in-kernel (XLA fuses the upcast)
    for name, dt8 in {"fp8_e4m3": "float8_e4m3fn",
                      "fp8_e5m2": "float8_e5m2"}.items():
        try:
            dtype8 = getattr(jnp, dt8)
            x8 = x32.astype(dtype8)
            w8 = w32.astype(dtype8)

            def f8(x, w):
                return jnp.matmul(x.astype(jnp.bfloat16),
                                  w.astype(jnp.bfloat16),
                                  preferred_element_type=jnp.float32)
            t = measure(f8, x8, w8, iters=iters, iters_lo=iters // 3)
            row[f"{name}_ms"] = round(t * 1e3, 4)
            # numerics vs f32 on unit-scale activations
            import numpy as np
            ref = np.asarray(jnp.matmul(x32, w32))
            got = np.asarray(f8(x8, w8), np.float32)
            rel = (np.linalg.norm(got - ref) / np.linalg.norm(ref))
            row[f"{name}_rel_err"] = float(f"{rel:.3e}")
            # native fp8 dot attempt (expected to upcast or fail pre-v6e)
            try:
                def fnat(x, w):
                    return jnp.matmul(x, w,
                                      preferred_element_type=jnp.float32)
                t2 = measure(fnat, x8, w8, iters=iters,
                             iters_lo=iters // 3)
                row[f"{name}_native_ms"] = round(t2 * 1e3, 4)
            except Exception as e:
                row[f"{name}_native_error"] = repr(e)[:120]
        except Exception as e:
            row[f"{name}_error"] = repr(e)[:200]
    return row


def main():
    import jax
    from galerkin_transformer_tpu.utils.jax_setup import setup
    setup()
    report = dict(backend=jax.default_backend(),
                  device=jax.devices()[0].device_kind, rows=[])
    for (n, d, b) in [(2048, 96, 8), (32768, 96, 8), (8192, 256, 8)]:
        row = bench_one(n, d, b)
        report["rows"].append(row)
        print(json.dumps(row), flush=True)
    out = os.path.join(REPO, "eval", "fp8_projection.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
