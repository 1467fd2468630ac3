"""CLI smoke tests for evaluate.py (the checkpoint -> batched-eval loop).

Guards the obs plumbing between the training checkpoints and the
evaluator — the IMAGE path regressed once (unflattened (B,n,L,H,W)
windows fed to the MLP) precisely because nothing drove evaluate.py in
CI.  Runs as subprocesses with --platform cpu (the conftest CPU config
does not cross process boundaries).
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    res = subprocess.run(
        [sys.executable] + args,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    return res.stdout


def test_evaluate_random_baseline(tmp_path):
    frames = str(tmp_path / "frames")
    out = _run(
        [
            "evaluate.py", "--env", "rware-tiny-2ag-v2", "--random",
            "--episodes", "4", "--max-steps", "8", "--platform", "cpu",
            "--render-frames", frames,
        ]
    )
    assert "mean_return=" in out
    assert len(os.listdir(frames)) == 60


import pytest


@pytest.mark.parametrize(
    "env_id", ["rware-img-tiny-2ag-v2", "rware-imgdict-tiny-2ag-v2"]
)
def test_evaluate_image_checkpoint(tmp_path, env_id):
    ckpt = str(tmp_path / "ckpt")
    _run(
        [
            "train.py", "--env", env_id, "--updates", "2",
            "--n-envs", "16", "--rollout-len", "8", "--platform", "cpu",
            "--checkpoint-dir", ckpt,
        ]
    )
    out = _run(
        [
            "evaluate.py", "--env", env_id,
            "--checkpoint-dir", ckpt, "--episodes", "4",
            "--max-steps", "8", "--platform", "cpu",
        ]
    )
    assert "mean_return=" in out
