"""CLI driver integration tests (tiny shapes, synthetic data, CPU)."""
import os
import sys

import pytest

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
                    "--val-batch-size", "4"])
    assert val < 10.0  # it ran and produced a finite metric


def test_ex4_driver_end_to_end(tmp_path, monkeypatch):
    import importlib
    import galerkin_transformer_tpu.utils.config as cfgmod
    monkeypatch.setattr(cfgmod, "MODEL_PATH", str(tmp_path))
    ex4 = importlib.import_module("ex4_navier_stokes_2+1d")
    monkeypatch.setattr(ex4, "MODEL_PATH", str(tmp_path))
    val = ex4.main(["--epochs", "2", "--n-samples", "16", "--batch-size", "2"])
    assert val < 10.0
