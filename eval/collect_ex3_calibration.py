"""Collect the torch-reference ex3 8-epoch calibration result
(run via /tmp/calib shim on the exported tau=3 .mat) into
eval/calibration_darcy_inv.json next to our own curve.

Ours (same data distribution, same 8-epoch OneCycle schedule, identical
loaders — round 2, models_ckpt jsonl): see `ours_history` below.
"""
import glob
import json
import os
import pickle
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

OURS_HISTORY = [0.270, 0.142, 0.086, 0.082, 0.062, 0.057, 0.054, 0.053]
OURS_FINAL = 5.27e-2  # full-valid metric of the best checkpoint (r2)


def main():
    pkls = sorted(glob.glob("/tmp/calib/models_ex3_r3/*.pkl"))
    if not pkls:
        sys.exit("no torch result pickle found")
    with open(pkls[-1], "rb") as f:
        r = pickle.load(f)
    out = dict(
        config="ex3 inverse Darcy, 141^2->36^2, 1% noise, 1024 train "
               "samples (tau=3 synthetic exported to .mat), 8-epoch "
               "OneCycle, seed 1127802",
        torch_reference=dict(
            best_val_metric=float(r["best_val_metric"]),
            best_val_epoch=int(r["best_val_epoch"]),
            val_history=[float(v) for v in r["loss_val"]],
            epochs_done=len(r["loss_val"]),
        ),
        this_repo=dict(
            best_val_metric=OURS_FINAL,
            val_history=OURS_HISTORY,
        ),
    )
    path = os.path.join(REPO, "eval", "calibration_darcy_inv.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
