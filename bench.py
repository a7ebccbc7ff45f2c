"""Headline benchmark: ex1 Burgers training-step throughput.

Measures the fully-jitted training step (forward + Sobolev loss + backward +
clip + Adam + 1cycle) of the flagship SimpleTransformer (4-layer galerkin
encoder, d=96, SpectralConv1d decoder) at the reference's ex1 defaults
(n=2048, batch 8) on the default JAX backend (TPU chip under the driver),
and — when the torch reference checkout is mounted — the reference's own
train_batch_burgers on this host for the vs_baseline ratio.

Prints ONE json line:
  {"metric": ..., "value": grid-points/sec/chip, "unit": ..., "vs_baseline": ...}
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

N_GRID = 2048
BATCH = 8
WARMUP = 3
ITERS = 10

# Per-chip peaks for the roofline/MFU denominators.  Matmul peak is the
# bf16 MXU number (XLA's default-precision f32 matmul runs as bf16 passes
# with f32 accumulation on TPU, so bf16 peak is the honest ceiling).
_CHIP_PEAKS = {  # device_kind substring -> (matmul TFLOP/s, HBM GB/s)
    "v5 lite": (197.0, 819.0),   # TPU v5e
    "v5e": (197.0, 819.0),
    "v5p": (459.0, 2765.0),
    "v4": (275.0, 1228.0),
    "v6 lite": (918.0, 1640.0),  # TPU v6e (Trillium)
    "v6e": (918.0, 1640.0),
}


def _chip_peaks():
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for sub, peaks in _CHIP_PEAKS.items():
        if sub in kind:
            return peaks
    return (None, None)


def _roofline(fn, args, dt):
    """FLOPs + HBM bytes from XLA cost analysis / measured step time,
    against the chip's peak: the defensible absolute perf numbers."""
    from galerkin_transformer_tpu.utils.profiling import compiled_cost

    try:
        cost = compiled_cost(fn, *args)
    except Exception:
        return {}
    flops = cost.get("flops")
    hbm = cost.get("bytes accessed")
    peak_tf, peak_bw = _chip_peaks()
    out = {}
    if flops and flops > 0:
        out["tflops_per_s"] = round(flops / dt / 1e12, 2)
        if peak_tf:
            out["mfu_pct"] = round(100 * flops / dt / (peak_tf * 1e12), 2)
    if hbm and hbm > 0:
        # cost-analysis 'bytes accessed' counts every HLO buffer access,
        # including VMEM-resident reuse inside fusions — it is an upper
        # bound on HBM traffic, so >100% of peak BW means VMEM-fused.
        out["bytes_accessed_gb_per_s"] = round(hbm / dt / 2**30, 1)
        if peak_bw:
            out["bytes_accessed_vs_hbm_peak_pct"] = round(
                100 * (hbm / dt / 2**30) / peak_bw, 1)
    return out


def bench_ours(batch_size=BATCH, bf16=False, accum_steps=1):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from galerkin_transformer_tpu.models import SimpleTransformer
    from galerkin_transformer_tpu.train.losses import WeightedL2Loss
    from galerkin_transformer_tpu.train.schedule import adam_onecycle
    from galerkin_transformer_tpu.train.steps import make_burgers_steps
    from galerkin_transformer_tpu.utils import load_config

    cfg = load_config("ex1_burgers", path=os.path.join(REPO, "config.yml"))
    cfg["attention_type"] = "galerkin"
    if bf16:
        cfg["dtype"] = jnp.bfloat16
    model = SimpleTransformer.from_config(cfg)

    rng = np.random.default_rng(0)
    node = jnp.asarray(rng.standard_normal((batch_size, N_GRID, 1)),
                       jnp.float32)
    edge = jnp.ones((batch_size, 1), jnp.float32)
    pos = jnp.linspace(0, 1, N_GRID, dtype=jnp.float32)[None, :, None]
    pos = jnp.broadcast_to(pos, (batch_size, N_GRID, 1))
    target = jnp.asarray(rng.standard_normal((batch_size, N_GRID, 2)),
                         jnp.float32)
    batch = dict(node=node, edge=edge, pos=pos, grid=pos, target=target)

    params = model.init(jax.random.key(0), node, edge, pos, pos)["params"]
    h = 1.0 / N_GRID
    tx, _ = adam_onecycle(1e-3, total_steps=10_000, grad_clip=0.999)
    opt_state = tx.init(params)
    train_step, _ = make_burgers_steps(
        model, WeightedL2Loss(regularizer=True, h=h, gamma=0.1),
        WeightedL2Loss(regularizer=False, h=h), tx, donate=False,
        accum_steps=accum_steps)

    # chained in-program timing with a host fetch: on the axon tunnel,
    # block_until_ready confirms dispatch, not completion (see
    # utils/profiling.py::_chained_runner) — a python dispatch loop here
    # over-reports throughput by >10x.
    from galerkin_transformer_tpu.utils.profiling import measure
    key = jax.random.key(0)
    dt = measure(train_step, params, opt_state, batch, key,
                 iters=3 * ITERS, iters_lo=ITERS)
    return dt, train_step, (params, opt_state, batch, key)


def bench_ours_2d(batch_size=4, bf16=True, n_fine=141, n_coarse=43,
                  build_only=False, accum_steps=1):
    """ex2 Darcy 2D train-step throughput (VERDICT r3 item 2): the full
    jitted FourierTransformer2D step (interp-CNN downscaler 141²→43²,
    6 galerkin encoder layers d=128, interp upsampler, SpectralConv2d
    decoder, Sobolev loss, Adam+1cycle) at the reference's ex2 defaults
    (reference: examples/ex2_darcy.py, examples/README.md:86)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from galerkin_transformer_tpu.data.darcy import DarcyDataset
    from galerkin_transformer_tpu.models import FourierTransformer2D
    from galerkin_transformer_tpu.train.losses import WeightedL2Loss2d
    from galerkin_transformer_tpu.train.schedule import adam_onecycle
    from galerkin_transformer_tpu.train.steps import make_darcy_steps
    from galerkin_transformer_tpu.utils import load_config

    down, up = DarcyDataset.get_scaler_sizes(n_fine, n_coarse)
    cfg = load_config("ex2_darcy", path=os.path.join(REPO, "config.yml"))
    cfg["attention_type"] = "galerkin"
    cfg["downscaler_size"] = down
    cfg["upscaler_size"] = up
    cfg["norm_eps"] = 1e-7
    if bf16:
        cfg["dtype"] = jnp.bfloat16
    model = FourierTransformer2D.from_config(cfg)

    rng = np.random.default_rng(0)
    b = batch_size
    node = jnp.asarray(rng.standard_normal((b, n_fine, n_fine, 1)),
                       jnp.float32)
    edge = jnp.ones((b, 1), jnp.float32)
    xc = jnp.linspace(0, 1, n_coarse, dtype=jnp.float32)
    pc = jnp.stack(jnp.meshgrid(xc, xc, indexing="ij"), -1).reshape(-1, 2)
    pos = jnp.broadcast_to(pc[None], (b, n_coarse * n_coarse, 2))
    xf = jnp.linspace(0, 1, n_fine, dtype=jnp.float32)
    gf = jnp.stack(jnp.meshgrid(xf, xf, indexing="ij"), -1)
    grid = jnp.broadcast_to(gf[None], (b, n_fine, n_fine, 2))
    target = jnp.asarray(rng.standard_normal((b, n_fine, n_fine, 1)),
                         jnp.float32)
    target_grad = jnp.asarray(
        rng.standard_normal((b, n_fine, n_fine, 2)), jnp.float32)
    coeff = jnp.asarray(rng.uniform(3, 12, (b, n_fine, n_fine, 1)),
                        jnp.float32)
    batch = dict(node=node, edge=edge, pos=pos, grid=grid, target=target,
                 target_grad=target_grad, coeff=coeff)

    params = model.init(jax.random.key(0), node, edge, pos, grid)["params"]
    h = 1.0 / n_fine
    tx, _ = adam_onecycle(1e-3, total_steps=10_000, pct_start=0.3,
                          grad_clip=0.99)
    opt_state = tx.init(params)
    train_step, _ = make_darcy_steps(
        model, WeightedL2Loss2d(regularizer=True, h=h, gamma=0.5),
        WeightedL2Loss2d(regularizer=False, h=h), tx, donate=False,
        accum_steps=accum_steps)

    key = jax.random.key(0)
    if build_only:
        return None, train_step, (params, opt_state, batch, key)
    from galerkin_transformer_tpu.utils.profiling import measure
    dt = measure(train_step, params, opt_state, batch, key,
                 iters=3 * ITERS, iters_lo=ITERS)
    return dt, train_step, (params, opt_state, batch, key)


def bench_ours_ns(batch_size=4, n_grid=64, t_in=10, t_out=10, bf16=True,
                  accum_steps=1):
    """ex4 NS rollout train-step throughput (VERDICT r4 item 8): the full
    jitted FourierTransformer2DLite 10-step BPTT rollout step (lax.scan
    over the autoregressive window slide, per-step Sobolev loss, one
    update) at the reference's ex4 defaults (64² grid, bsz 4; reference:
    examples/ex4_navier_stokes_2+1d.py:27-55, libs/ns_lite.py:205-238)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from galerkin_transformer_tpu.models import FourierTransformer2DLite
    from galerkin_transformer_tpu.train.losses import WeightedL2Loss2d
    from galerkin_transformer_tpu.train.schedule import adam_onecycle
    from galerkin_transformer_tpu.train.steps import make_ns_steps
    from galerkin_transformer_tpu.utils import load_config

    cfg = load_config("ex4_navier_stokes", path=os.path.join(REPO,
                                                             "config.yml"))
    if bf16:
        cfg["dtype"] = jnp.bfloat16
    model = FourierTransformer2DLite.from_config(cfg)

    rng = np.random.default_rng(0)
    b, n = batch_size, n_grid
    node = jnp.asarray(rng.standard_normal((b, n, n, t_in)), jnp.float32)
    x1 = jnp.linspace(0, 1, n, dtype=jnp.float32)
    g = jnp.stack(jnp.meshgrid(x1, x1, indexing="ij"), -1)
    grid = jnp.broadcast_to(g[None], (b, n, n, 2))
    pos = jnp.broadcast_to(g.reshape(-1, 2)[None], (b, n * n, 2))
    target = jnp.asarray(rng.standard_normal((b, n, n, t_out)), jnp.float32)
    tgrad = jnp.asarray(rng.standard_normal((b, n, n, 2, t_out)),
                        jnp.float32)
    batch = dict(node=node, pos=pos, grid=grid, target=target,
                 target_grad=tgrad)

    params = model.init(jax.random.key(0), node, None, pos, grid)["params"]
    h = 1.0 / n
    tx, _ = adam_onecycle(1e-3, total_steps=10_000, grad_clip=0.999)
    opt_state = tx.init(params)
    train_step, _ = make_ns_steps(
        model, WeightedL2Loss2d(regularizer=True, h=h, gamma=0.1),
        WeightedL2Loss2d(regularizer=False, h=h), tx,
        time_steps=t_out, donate=False, accum_steps=accum_steps)

    key = jax.random.key(0)
    from galerkin_transformer_tpu.utils.profiling import measure
    dt = measure(train_step, params, opt_state, batch, key,
                 iters=3 * ITERS, iters_lo=ITERS)
    return dt, train_step, (params, opt_state, batch, key)


def bench_reference():
    """Reference torch train step on this host (its only runnable backend
    here).  Returns seconds/step or None."""
    ref = "/root/reference/libs"
    if not os.path.exists(ref):
        return None
    try:
        import types
        if "torchinfo" not in sys.modules:
            stub = types.ModuleType("torchinfo")
            stub.summary = lambda *a, **k: None
            sys.modules["torchinfo"] = stub
        sys.path.insert(0, ref)
        import numpy as np
        import torch
        import yaml
        from model import SimpleTransformer as RefModel
        from ft import WeightedL2Loss as RefLoss
        from utils_ft import train_batch_burgers
        from torch.optim.lr_scheduler import OneCycleLR

        with open(os.path.join(REPO, "config.yml")) as f:
            cfg = yaml.safe_load(f)["ex1_burgers"]
        cfg["attention_type"] = "galerkin"
        cfg["debug"] = False
        model = RefModel(**cfg)
        device = torch.device("cpu")
        rng = np.random.default_rng(0)
        data = dict(
            node=torch.tensor(rng.standard_normal((BATCH, N_GRID, 1)),
                              dtype=torch.float32),
            edge=torch.ones(BATCH, 1),
            pos=torch.linspace(0, 1, N_GRID)[None, :, None].repeat(BATCH, 1, 1),
            target=torch.tensor(rng.standard_normal((BATCH, N_GRID, 2)),
                                dtype=torch.float32),
        )
        data["grid"] = data["pos"]
        optimizer = torch.optim.Adam(model.parameters(), lr=1e-3)
        scheduler = OneCycleLR(optimizer, max_lr=1e-3, div_factor=1e4,
                               final_div_factor=1e4, pct_start=0.2,
                               steps_per_epoch=100, epochs=100)
        loss_fn = RefLoss(regularizer=True, h=1 / N_GRID, gamma=0.1)
        for _ in range(1):
            train_batch_burgers(model, loss_fn, data, optimizer, scheduler,
                                device)
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            train_batch_burgers(model, loss_fn, data, optimizer, scheduler,
                                device)
        return (time.perf_counter() - t0) / iters
    except Exception:
        return None


def bench_galerkin_kernel(n=8192, d_model=96, n_head=1, batch=8):
    """Roofline of the full Galerkin attention op (LN on K,V + pos concat +
    both matmuls; fwd and fwd+bwd) at the BASELINE north-star shape.

    'blocked' is the production path (ops/attention.py:
    galerkin_attention_pos_blocked — concat-free block matmuls);
    'pallas' is the fused kernel kept for reference / beyond-VMEM shapes."""
    import jax
    import jax.numpy as jnp
    from galerkin_transformer_tpu.ops.attention import (
        galerkin_attention_pos_blocked, per_head_layer_norm)
    from galerkin_transformer_tpu.ops.pallas.galerkin import \
        galerkin_attention_fused

    d_k = d_model // n_head
    ks = jax.random.split(jax.random.key(0), 5)
    q = jax.random.normal(ks[0], (batch, n_head, n, d_k), jnp.float32)
    k = jax.random.normal(ks[1], (batch, n_head, n, d_k), jnp.float32)
    v = jax.random.normal(ks[2], (batch, n_head, n, d_k), jnp.float32)
    pos = jnp.linspace(0, 1, n, dtype=jnp.float32)[None, :, None]
    pos = jnp.broadcast_to(pos, (batch, n, 1))
    sk = jnp.ones((n_head, d_k), jnp.float32)
    bk = jnp.zeros((n_head, d_k), jnp.float32)

    def blocked(q, k, v):
        kn = per_head_layer_norm(k, sk, bk)
        vn = per_head_layer_norm(v, sk, bk)
        return galerkin_attention_pos_blocked(q, kn, vn, pos)[0]

    def pallas(q, k, v):
        return galerkin_attention_fused(q, k, v, pos, sk, bk, sk, bk)[0]

    from galerkin_transformer_tpu.utils.profiling import measure
    rows = {}
    for name, fwd in [("blocked", blocked), ("pallas", pallas)]:
        def fwdbwd(q, k, v, fwd=fwd):
            return jax.grad(lambda *a: fwd(*a).sum(), argnums=(0, 1, 2))(
                q, k, v)
        r = {}
        for tag, fn in [("fwd", fwd), ("fwd_bwd", fwdbwd)]:
            dt = measure(fn, q, k, v, iters=3 * ITERS, iters_lo=ITERS)
            r[tag] = dict(step_ms=round(dt * 1e3, 4),
                          **_roofline(fn, (q, k, v), dt))
        rows[name] = r
    return rows


def main():
    # headline: bf16 encoder activations + "high" (3-pass bf16) matmul
    # precision — the accuracy-NEUTRAL fast config from the round-3
    # precision audit (2.943e-3 @100ep vs 2.884e-3 at f32-highest, inside
    # seed noise; the default 1-pass matmul costs +12-14% accuracy and is
    # no longer the benched config — docs/PERFORMANCE.md frontier table).
    # f32 and a batch-64 scaling point are reported alongside.
    import jax
    jax.config.update("jax_default_matmul_precision", "high")
    dt16, step16, args16 = bench_ours(bf16=True)
    dt32, step32, args32 = bench_ours(bf16=False)
    dt64, _, _ = bench_ours(batch_size=64, bf16=True)
    # bsz-64 with x8 microbatch accumulation: each microbatch stays in the
    # VMEM weights-resident regime, beating even bsz-8 per-sample cost
    # (docs/PERFORMANCE.md round-4 accumulation table).
    dt64a, _, _ = bench_ours(batch_size=64, bf16=True, accum_steps=8)
    points_per_sec = BATCH * N_GRID / dt16
    ref_dt = bench_reference()
    vs = (ref_dt / dt16) if ref_dt else None
    record = {
        "metric": "ex1_burgers_galerkin_train_step_grid_points_per_sec_per_chip",
        "value": round(points_per_sec, 1),
        "unit": "grid-points/s (n=2048, bsz=8, full train step, bf16 "
                "encoder + high matmul precision — accuracy-neutral "
                "config: 2.64e-3 @100ep vs 2.60e-3 f32-highest under the "
                "round-3 recipe; 2.94e-3 vs 2.88e-3 pre-recipe)",
        "vs_baseline": round(vs, 2) if vs else None,
        "step_ms": round(dt16 * 1e3, 3),
        "f32_step_ms": round(dt32 * 1e3, 3),
        "bsz64_step_ms": round(dt64 * 1e3, 3),
        "bsz64_grid_points_per_s": round(64 * N_GRID / dt64, 1),
        "bsz64_accum8_step_ms": round(dt64a * 1e3, 3),
        "bsz64_accum8_grid_points_per_s": round(64 * N_GRID / dt64a, 1),
    }
    record.update(_roofline(step16, args16, dt16))
    f32_roof = {f"f32_{k}": v
                for k, v in _roofline(step32, args32, dt32).items()}
    record.update(f32_roof)
    # second workload: the ex2 2D train step (141²→43², d=128).  bsz 16 is
    # the measured batch-scaling optimum (round-5 sweep,
    # eval/ex2_batch_scaling.json: 8.89M pts/s at the reference's
    # VRAM-capped bsz 4 → 11.5M at bsz 16; 32+ regresses); bsz 4 is kept
    # as the reference-comparable point.
    dt2d, step2d, args2d = bench_ours_2d(batch_size=16)
    dt2d4, _, _ = bench_ours_2d(batch_size=4)
    rec2d = {
        "step_ms": round(dt2d * 1e3, 3),
        "grid_points_per_s": round(16 * 141 * 141 / dt2d, 1),
        "unit": "fine-grid points/s (141² fine / 43² coarse, bsz 16 — the "
                "batch-scaling optimum; full train step, bf16 encoder + "
                "bf16 conv scalers + high matmul)",
        "bsz4_step_ms": round(dt2d4 * 1e3, 3),
        "bsz4_grid_points_per_s": round(4 * 141 * 141 / dt2d4, 1),
    }
    rec2d.update(_roofline(step2d, args2d, dt2d))
    record["ex2_darcy_2d"] = rec2d
    # third workload: the ex4 NS rollout step (10-step BPTT, 64², bsz 4)
    dtns, stepns, argsns = bench_ours_ns()
    recns = {
        "step_ms": round(dtns * 1e3, 3),
        "rollout_grid_points_per_s": round(4 * 64 * 64 * 10 / dtns, 1),
        "unit": "rollout grid-points/s (64² grid × 10 BPTT steps, bsz 4, "
                "full train step incl. per-step Sobolev loss, bf16 "
                "encoder + high matmul)",
    }
    recns.update(_roofline(stepns, argsns, dtns))
    record["ex4_ns_rollout"] = recns
    if "--roofline" in sys.argv:
        record["galerkin_kernel_n8192"] = bench_galerkin_kernel()
    print(json.dumps(record))


if __name__ == "__main__":
    main()
