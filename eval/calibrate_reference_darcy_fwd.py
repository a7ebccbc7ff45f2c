"""Controlled ex2 (forward Darcy) accuracy calibration: train the TORCH
REFERENCE on this repo's exported MG Darcy fields (VERDICT r4 item 5 —
the ex3-style same-data row for ex2).

The reference implementation runs on CPU (its only backend here) with its
OWN DarcyDataset/loss/optimizer/training loop on the .mat files exported
by eval/export_darcy_mat.py from this repo's synthetic caches, so the
comparison against `python examples/ex2_darcy.py --train-path ...
--valid-path ... --epochs <E>` (same fields, same schedule, same seed) is
a controlled row like eval/calibration_darcy_inv.json.

Reference pieces exercised: DarcyDataset (/root/reference/libs/ft.py:418),
FourierTransformer2D (model.py:945), train_batch_darcy/validate_epoch_darcy
(utils_ft.py:656,690), OneCycleLR recipe (examples/ex2_darcy.py:105-116).

Usage:
  python eval/export_darcy_mat.py --out /tmp/calib \
      --train-cache data_files/darcy_synth_n421_s1024_t3_jax_seed1127809.npz \
      --valid-cache data_files/darcy_synth_n421_s128_t3_jax_seed1127802.npz
  python eval/calibrate_reference_darcy_fwd.py --epochs 8
Writes eval/calibration_darcy_fwd.json (+ optional --checkpoint).
"""
import argparse
import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/libs"
sys.path.insert(0, REPO)
if "torchinfo" not in sys.modules:
    stub = types.ModuleType("torchinfo")
    stub.summary = lambda *a, **k: None
    sys.modules["torchinfo"] = stub
sys.path.insert(0, REF)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--data-dir", type=str, default="/tmp/calib")
    ap.add_argument("--subsample-nodes", type=int, default=3)
    ap.add_argument("--subsample-attn", type=int, default=6)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--gamma", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=1127802)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--checkpoint", type=str, default=None)
    ap.add_argument("--max-steps-per-epoch", type=int, default=None,
                    help="smoke-test cap; leave unset for real calibration")
    args = ap.parse_args()

    import numpy as np
    import torch
    import yaml
    from ft import DarcyDataset, WeightedL2Loss2d
    from model import FourierTransformer2D
    from torch.optim.lr_scheduler import OneCycleLR
    from torch.utils.data import DataLoader
    from utils_ft import train_batch_darcy, validate_epoch_darcy

    torch.manual_seed(args.seed)
    np.random.seed(args.seed)
    device = torch.device("cpu")

    train_path = os.path.join(args.data_dir,
                              "piececonst_r421_N1024_smooth1.mat")
    valid_path = os.path.join(args.data_dir,
                              "piececonst_r421_N1024_smooth2.mat")
    train_ds = DarcyDataset(data_path=train_path,
                            subsample_attn=args.subsample_attn,
                            subsample_nodes=args.subsample_nodes,
                            train_data=True, train_len=1024)
    valid_ds = DarcyDataset(data_path=valid_path,
                            normalizer_x=train_ds.normalizer_x,
                            subsample_attn=args.subsample_attn,
                            subsample_nodes=args.subsample_nodes,
                            train_data=False, valid_len=100)
    g = torch.Generator()
    g.manual_seed(args.seed)
    train_loader = DataLoader(train_ds, batch_size=args.batch_size,
                              shuffle=True, drop_last=True, generator=g)
    valid_loader = DataLoader(valid_ds, batch_size=4, shuffle=False)

    n_grid = int(((421 - 1) / args.subsample_nodes) + 1)
    n_grid_c = int(((421 - 1) / args.subsample_attn) + 1)
    downsample, upsample = DarcyDataset.get_scaler_sizes(n_grid, n_grid_c)

    with open(os.path.join(REPO, "config.yml")) as f:
        config = yaml.full_load(f)["ex2_darcy"]
    config["normalizer"] = train_ds.normalizer_y.to(device)
    config["downscaler_size"] = downsample
    config["upscaler_size"] = upsample
    config["attn_norm"] = True
    config["norm_eps"] = 1e-7  # n_grid=141 < 211 (ex2_darcy.py:75-78)
    config["debug"] = False

    model = FourierTransformer2D(**config).to(device)
    n_params = sum(p.numel() for p in model.parameters())
    print(f"[torch-ref ex2] params {n_params}, train {len(train_ds)}, "
          f"valid {len(valid_ds)}, {n_grid}^2 fine / {n_grid_c}^2 coarse",
          flush=True)

    lr = args.lr if config["attention_type"] == "galerkin" \
        else min(args.lr, 5e-4)
    h = 1 / n_grid
    optimizer = torch.optim.Adam(model.parameters(), lr=lr)
    scheduler = OneCycleLR(optimizer, max_lr=lr, div_factor=1e4,
                           final_div_factor=1e4, pct_start=0.3,
                           steps_per_epoch=len(train_loader),
                           epochs=args.epochs)
    loss_fn = WeightedL2Loss2d(regularizer=True, h=h, gamma=args.gamma)
    metric_fn = WeightedL2Loss2d(regularizer=False, h=h)

    best = float("inf")
    history = []
    t0 = time.time()
    path = args.out or os.path.join(REPO, "eval",
                                    "calibration_darcy_fwd.json")

    start_epoch = 0
    if args.checkpoint and os.path.exists(args.checkpoint):
        ck = torch.load(args.checkpoint, map_location="cpu",
                        weights_only=False)
        model.load_state_dict(ck["model"])
        optimizer.load_state_dict(ck["optimizer"])
        scheduler.load_state_dict(ck["scheduler"])
        torch.set_rng_state(ck["torch_rng"])
        np.random.set_state(ck["np_rng"])
        history, best = ck["history"], ck["best"]
        start_epoch = ck["epochs_done"]
        t0 = time.time() - ck["wall_s"]
        print(f"[torch-ref ex2] resumed at epoch {start_epoch}", flush=True)

    def save_checkpoint(epochs_done):
        if not args.checkpoint:
            return
        tmp = args.checkpoint + ".tmp"
        torch.save(dict(model=model.state_dict(),
                        optimizer=optimizer.state_dict(),
                        scheduler=scheduler.state_dict(),
                        torch_rng=torch.get_rng_state(),
                        np_rng=np.random.get_state(),
                        history=history, best=best,
                        epochs_done=epochs_done,
                        wall_s=round(time.time() - t0, 1)), tmp)
        os.replace(tmp, args.checkpoint)

    def dump():
        out = dict(framework="torch-reference",
                   workload="ex2_darcy_forward",
                   data="repo-synthetic MG tau=3 fields exported to .mat",
                   n_grid=n_grid, n_grid_coarse=n_grid_c,
                   epochs=args.epochs, seed=args.seed,
                   epochs_done=len(history), n_train=len(train_ds),
                   n_valid=len(valid_ds), best_val_metric=best,
                   history=history, wall_s=round(time.time() - t0, 1))
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        return out

    for ep in range(start_epoch, args.epochs):
        model.train()
        for i, data in enumerate(train_loader):
            if args.max_steps_per_epoch and i >= args.max_steps_per_epoch:
                break
            train_batch_darcy(model, loss_fn, data, optimizer, scheduler,
                              device)
            if (i + 1) % 32 == 0:
                print(f"[torch-ref ex2] epoch {ep + 1} step {i + 1}/"
                      f"{len(train_loader)} ({time.time() - t0:.0f}s)",
                      flush=True)
        val = validate_epoch_darcy(model, metric_fn, valid_loader, device)
        metric = float(val["metric"])
        best = min(best, metric)
        history.append(metric)
        print(f"[torch-ref ex2] epoch {ep + 1}/{args.epochs} "
              f"val {metric:.4e} best {best:.4e} "
              f"({time.time() - t0:.0f}s)", flush=True)
        dump()
        save_checkpoint(ep + 1)

    print(json.dumps(dump()))


if __name__ == "__main__":
    main()
