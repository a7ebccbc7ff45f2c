"""CLI driver integration tests (tiny shapes, synthetic data, CPU)."""
import os
import sys

import pytest

pytestmark = pytest.mark.slow  # full example drivers: the E2E tier

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")
sys.path.insert(0, EXAMPLES)


def test_ex1_driver_end_to_end(tmp_path, monkeypatch):
    monkeypatch.setenv("MODEL_PATH", str(tmp_path))
    import importlib
    import galerkin_transformer_tpu.utils.config as cfgmod
    monkeypatch.setattr(cfgmod, "MODEL_PATH", str(tmp_path))
    ex1 = importlib.import_module("ex1_burgers")
    monkeypatch.setattr(ex1, "MODEL_PATH", str(tmp_path))
    val = ex1.main(["--subsample", "32", "--epochs", "2",
                    "--n-samples", "24", "--batch-size", "4",
                    "--val-batch-size", "4", "--accum-steps", "2"])
    assert val < 10.0  # it ran and produced a finite metric


def test_super_res_driver_reverse(tmp_path, monkeypatch):
    """Reverse super-res cell: train on the finer grid, eval zero-shot on
    the coarser one (--train-subsample/--eval-subsample, round 5)."""
    import importlib
    import galerkin_transformer_tpu.utils.config as cfgmod
    monkeypatch.setattr(cfgmod, "MODEL_PATH", str(tmp_path))
    sr = importlib.import_module("ex1_burgers_super_res")
    monkeypatch.setattr(sr, "MODEL_PATH", str(tmp_path))
    val = sr.main(["--train-subsample", "16", "--eval-subsample", "32",
                   "--epochs", "2", "--n-samples", "24",
                   "--batch-size", "4", "--val-batch-size", "4"])
    assert val == val and val < 10.0


def test_ex4_driver_end_to_end(tmp_path, monkeypatch):
    import importlib
    import galerkin_transformer_tpu.utils.config as cfgmod
    monkeypatch.setattr(cfgmod, "MODEL_PATH", str(tmp_path))
    ex4 = importlib.import_module("ex4_navier_stokes_2+1d")
    monkeypatch.setattr(ex4, "MODEL_PATH", str(tmp_path))
    val = ex4.main(["--epochs", "2", "--n-samples", "16", "--batch-size", "2"])
    assert val < 10.0


def test_ex2_driver_end_to_end(tmp_path, monkeypatch):
    import importlib
    import galerkin_transformer_tpu.utils.config as cfgmod
    monkeypatch.setattr(cfgmod, "MODEL_PATH", str(tmp_path))
    ex2 = importlib.import_module("ex2_darcy")
    monkeypatch.setattr(ex2, "MODEL_PATH", str(tmp_path))
    val = ex2.main(["--n-grid-fine", "61", "--epochs", "2",
                    "--n-samples", "8", "--batch-size", "2",
                    "--val-batch-size", "2"])
    assert val == val and val < 1e9  # finite


def test_ex3_driver_end_to_end(tmp_path, monkeypatch):
    import importlib
    import galerkin_transformer_tpu.utils.config as cfgmod
    monkeypatch.setattr(cfgmod, "MODEL_PATH", str(tmp_path))
    ex3 = importlib.import_module("ex3_darcy_inv")
    monkeypatch.setattr(ex3, "MODEL_PATH", str(tmp_path))
    val = ex3.main(["--n-grid-fine", "61", "--epochs", "2",
                    "--n-samples", "8", "--batch-size", "2",
                    "--val-batch-size", "2", "--noise", "0.01"])
    assert val == val and val < 1e9  # finite
