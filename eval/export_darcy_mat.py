"""Export this repo's synthetic Darcy caches as reference-format .mat files.

The torch reference's DarcyDataset (/root/reference/libs/ft.py:499-507)
loads `piececonst_r421_N1024_smooth1.mat` (train) and `..._smooth2.mat`
(valid) with keys `coeff`, `sol`.  This script converts the npz caches
written by `data.darcy.DarcyDataset._load` into that format so the
reference implementation can train on the EXACT same fields for the
controlled ex3/ex2 accuracy calibration (VERDICT round-1 item 5).

Usage:
  python eval/export_darcy_mat.py --out /tmp/calib \
      [--train-cache data_files/darcy_synth_n421_s1024_t3_seed1127802.npz] \
      [--valid-cache data_files/darcy_synth_n421_s256_t3_seed1127809.npz]
"""
import argparse
import os
import sys

import numpy as np
from scipy.io import savemat

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/calib")
    ap.add_argument("--train-cache", default=os.path.join(
        REPO, "data_files", "darcy_synth_n421_s1024_t3_seed1127802.npz"))
    ap.add_argument("--valid-cache", default=os.path.join(
        REPO, "data_files", "darcy_synth_n421_s256_t3_seed1127809.npz"))
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    for cache, name in ((args.train_cache, "piececonst_r421_N1024_smooth1"),
                        (args.valid_cache, "piececonst_r421_N1024_smooth2")):
        if not os.path.exists(cache):
            sys.exit(f"missing cache {cache} — run the ex2/ex3 driver once "
                     "to generate it")
        with np.load(cache) as z:
            coeff, sol = z["coeff"], z["sol"]
        out = os.path.join(args.out, f"{name}.mat")
        savemat(out, {"coeff": coeff.astype(np.float32),
                      "sol": sol.astype(np.float32)}, do_compression=False)
        print(f"{out}: coeff/sol {coeff.shape} from {os.path.basename(cache)}")


if __name__ == "__main__":
    main()
