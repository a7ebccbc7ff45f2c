"""Watchdog supervisor: stall detection, kill, epoch-parse, resume."""
import os
import sys
import textwrap

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import pytest

import supervise  # noqa: E402


def test_strip_resume():
    cmd = ["python", "x.py", "--resume-epoch", "7", "--epochs", "9",
           "--resume-epoch=3"]
    assert supervise.strip_resume(cmd) == ["python", "x.py", "--epochs", "9"]


def test_last_epoch(tmp_path):
    log = tmp_path / "run.log"
    log.write_text("noise\nepoch [3/10] loss ...\nepoch [4/10] val ...\n")
    assert supervise.last_epoch(str(log)) == 4
    log.write_text("no epochs here")
    assert supervise.last_epoch(str(log)) is None


@pytest.mark.slow
def test_kills_stall_and_resumes(tmp_path):
    """A child that prints two epochs then hangs gets killed; the relaunch
    (with --resume-epoch 2) runs to completion."""
    child = tmp_path / "fake_driver.py"
    child.write_text(textwrap.dedent("""\
        import argparse, sys, time
        p = argparse.ArgumentParser()
        p.add_argument("--resume-epoch", type=int, default=None)
        a = p.parse_args()
        if a.resume_epoch is None:
            print("epoch [1/4] val 1.0", flush=True)
            print("epoch [2/4] val 0.5", flush=True)
            time.sleep(3600)  # wedge
        else:
            for k in range(a.resume_epoch + 1, 5):
                print(f"epoch [{k}/4] val 0.1", flush=True)
            print("Best model's validation metric: 1.0e-1", flush=True)
    """))
    log = tmp_path / "run.log"
    # deadline must exceed interpreter startup on a loaded host, or the
    # healthy resumed child gets declared stalled before its first print
    rc = supervise.main(["--deadline", "10", "--poll", "0.2",
                         "--log", str(log), "--max-restarts", "2", "--",
                         sys.executable, str(child)])
    assert rc == 0
    text = log.read_text()
    assert "epoch [2/4]" in text          # pre-stall progress
    assert "epoch [4/4]" in text          # resumed run finished
    assert "Best model's" in text


@pytest.mark.slow
def test_gives_up_after_max_restarts(tmp_path):
    child = tmp_path / "always_hangs.py"
    child.write_text("import time\nprint('x', flush=True)\ntime.sleep(3600)\n")
    log = tmp_path / "run.log"
    rc = supervise.main(["--deadline", "1", "--poll", "0.2",
                         "--log", str(log), "--max-restarts", "1", "--",
                         sys.executable, str(child)])
    assert rc == 2
