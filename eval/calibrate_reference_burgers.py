"""Controlled accuracy calibration: train the TORCH REFERENCE on this
repo's synthetic Burgers data (VERDICT round-1 item 5).

Round 1 attributed the ex1 accuracy gap vs the reference's published
numbers (BASELINE.md) to the synthetic data being harder than the R10
dataset — this script turns that claim into a measurement: the reference
implementation (running on CPU, its only backend here) trains on the
EXACT arrays produced by this repo's BurgersDataset, with the reference's
own loss, optimizer recipe, and train/validate loops
(/root/reference/libs/utils_ft.py:593-653).  Compare against
`python examples/ex1_burgers.py --epochs <E> --attention-type galerkin`
which consumes the same cached samples.

Usage:  python eval/calibrate_reference_burgers.py --epochs 20 [--subsample 4]
Writes eval/calibration_burgers.json.
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
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--subsample", type=int, default=4)
    ap.add_argument("--n-samples", type=int, default=2148)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--gamma", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=1127802)
    ap.add_argument("--out", type=str, default=None,
                    help="output json path (default eval/calibration_burgers.json)")
    ap.add_argument("--validate-every", type=int, default=1,
                    help="validate every K epochs (always validates the "
                         "final 10%% of epochs); cuts wall time on long "
                         "CPU anchor runs where the two validation passes "
                         "cost ~30s/epoch vs ~88s of training")
    ap.add_argument("--no-score-dropout", action="store_true", default=False,
                    help="ablation: neutralize the reference's hard-coded "
                         "F.dropout(p_attn) (p=0.5, training=True always — "
                         "layers.py:700-701,730-731) to isolate its effect "
                         "on the controlled comparison")
    ap.add_argument("--checkpoint", type=str, default=None,
                    help="torch checkpoint path for long anchor runs; if the "
                         "file exists the run resumes from it (model + "
                         "optimizer + scheduler + RNG states + history), so "
                         "a ~20 h 500-epoch CPU run survives machine resets "
                         "between build rounds")
    args = ap.parse_args()

    if args.no_score_dropout:
        import torch.nn.functional as F
        _real_dropout = F.dropout

        def _passthrough(x, p=0.5, training=True, inplace=False):
            return x
        F.dropout = _passthrough

    import numpy as np
    import torch
    import yaml
    from model import SimpleTransformer as RefModel
    from ft import WeightedL2Loss as RefLoss
    from utils_ft import train_batch_burgers, validate_epoch_burgers
    from torch.optim.lr_scheduler import OneCycleLR

    from galerkin_transformer_tpu.data import BurgersDataset, DataLoader

    torch.manual_seed(args.seed)
    np.random.seed(args.seed)

    train_ds = BurgersDataset(subsample=args.subsample, train_data=True,
                              train_portion=0.5,
                              n_samples_synthetic=args.n_samples)
    valid_ds = BurgersDataset(subsample=args.subsample, train_data=False,
                              valid_portion=100,
                              n_samples_synthetic=args.n_samples)
    train_loader = DataLoader(train_ds, args.batch_size, shuffle=True,
                              drop_last=True, seed=1127802)
    valid_loader = DataLoader(valid_ds, 16)

    class TorchBatches:
        """Wrap the numpy DataLoader as torch-tensor dict batches."""

        def __init__(self, loader):
            self.loader = loader

        def __iter__(self):
            for b in self.loader:
                yield {k: torch.from_numpy(np.ascontiguousarray(v))
                       for k, v in b.items()}

        def __len__(self):
            return len(self.loader)

    with open(os.path.join(REPO, "config.yml")) as f:
        cfg = yaml.safe_load(f)["ex1_burgers"]
    cfg["attention_type"] = "galerkin"
    cfg["debug"] = False
    model = RefModel(**cfg)
    device = torch.device("cpu")

    n = train_ds.n_grid
    h = 1.0 / n
    steps_per_epoch = len(train_loader)
    optimizer = torch.optim.Adam(model.parameters(), lr=args.lr)
    scheduler = OneCycleLR(optimizer, max_lr=args.lr, div_factor=1e4,
                           final_div_factor=1e4, pct_start=0.2,
                           steps_per_epoch=steps_per_epoch,
                           epochs=args.epochs)
    loss_fn = RefLoss(regularizer=True, h=h, gamma=args.gamma)
    metric_fn = RefLoss(regularizer=False, h=h)

    best = float("inf")
    history = []
    t0 = time.time()
    path = args.out or os.path.join(REPO, "eval", "calibration_burgers.json")

    history_clean = []
    best_clean = float("inf")

    start_epoch = 0
    if args.checkpoint and os.path.exists(args.checkpoint):
        ck = torch.load(args.checkpoint, map_location="cpu",
                        weights_only=False)
        model.load_state_dict(ck["model"])
        optimizer.load_state_dict(ck["optimizer"])
        scheduler.load_state_dict(ck["scheduler"])
        torch.set_rng_state(ck["torch_rng"])
        np.random.set_state(ck["np_rng"])
        history = ck["history"]
        history_clean = ck["history_clean"]
        best = ck["best"]
        best_clean = ck["best_clean"]
        start_epoch = ck["epochs_done"]
        # the loader reshuffles with rng(seed + epoch); fast-forward its
        # epoch counter so the sample order continues exactly where the
        # interrupted run left off
        train_loader._epoch = start_epoch
        t0 = time.time() - ck["wall_s"]
        print(f"[torch-ref] resumed from {args.checkpoint} at epoch "
              f"{start_epoch} (best {best:.4e})", flush=True)

    def save_checkpoint(epochs_done):
        if not args.checkpoint:
            return
        tmp = args.checkpoint + ".tmp"
        torch.save(dict(model=model.state_dict(),
                        optimizer=optimizer.state_dict(),
                        scheduler=scheduler.state_dict(),
                        torch_rng=torch.get_rng_state(),
                        np_rng=np.random.get_state(),
                        history=history, history_clean=history_clean,
                        best=best, best_clean=best_clean,
                        epochs_done=epochs_done,
                        wall_s=round(time.time() - t0, 1)), tmp)
        os.replace(tmp, args.checkpoint)

    def dump():
        out = dict(framework="torch-reference",
                   data="repo-synthetic-burgers",
                   subsample=args.subsample, n_grid=n, epochs=args.epochs,
                   seed=args.seed, epochs_done=len(history),
                   n_train=len(train_ds), n_valid=len(valid_ds),
                   best_val_metric=best, history=history,
                   best_val_metric_clean=best_clean,
                   history_clean=history_clean,
                   wall_s=round(time.time() - t0, 1))
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        return out

    tail_start = args.epochs - max(1, args.epochs // 10)
    for ep in range(start_epoch, args.epochs):
        model.train()
        for data in TorchBatches(train_loader):
            train_batch_burgers(model, loss_fn, data, optimizer, scheduler,
                                device)
        if (ep + 1) % args.validate_every and ep < tail_start:
            history.append(None)
            history_clean.append(None)
            print(f"[torch-ref] epoch {ep + 1}/{args.epochs} "
                  f"(validation skipped) ({time.time() - t0:.0f}s)",
                  flush=True)
            dump()
            save_checkpoint(ep + 1)
            continue
        val = validate_epoch_burgers(model, metric_fn,
                                     TorchBatches(valid_loader), device)
        metric = float(val["metric"])
        best = min(best, metric)
        history.append(metric)
        # second, CLEAN validation pass: the reference's hard-coded
        # F.dropout(p_attn) (training=True even in eval, layers.py:700-701)
        # makes its reported metric a noisy draw; suppressing dropout for
        # one extra pass records the de-noised metric alongside, so the
        # torch side is comparable to a deterministic-eval framework.
        import torch.nn.functional as F
        _dropout_now = F.dropout
        F.dropout = lambda x, p=0.5, training=True, inplace=False: x
        try:
            val_clean = validate_epoch_burgers(model, metric_fn,
                                               TorchBatches(valid_loader),
                                               device)
        finally:
            F.dropout = _dropout_now
        metric_clean = float(val_clean["metric"])
        best_clean = min(best_clean, metric_clean)
        history_clean.append(metric_clean)
        print(f"[torch-ref] epoch {ep + 1}/{args.epochs} "
              f"val {metric:.4e} best {best:.4e} "
              f"clean {metric_clean:.4e} best-clean {best_clean:.4e} "
              f"({time.time() - t0:.0f}s)", flush=True)
        dump()  # progressive save: long runs keep a usable partial curve
        save_checkpoint(ep + 1)

    print(json.dumps(dump()))


if __name__ == "__main__":
    main()
