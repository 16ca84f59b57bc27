"""CLI smoke tests (subcommands on a short prefix of the real data)."""

import json
import os

import numpy as np
import pytest

from tpuvo.cli import main


def test_cli_run_writes_artifacts(tmp_path, data_dir, capsys):
    main(["--data", data_dir, "--frames", "20", "run", "--out", str(tmp_path)])
    out = capsys.readouterr().out
    summary = json.loads(out[out.index("{"):])
    assert summary["map_count"] > 50
    for f in (
        "estimated_trajectory.txt", "estimated_trajectory_scaled.txt",
        "errors.txt", "estimated_world_points.txt", "metrics.jsonl",
        "gt_vs_est_trajectory.png",
    ):
        assert (tmp_path / f).exists(), f
    traj = np.loadtxt(tmp_path / "estimated_trajectory.txt")
    assert traj.shape == (20, 4)


def test_cli_match_test(data_dir, capsys):
    main(["--data", data_dir, "--frames", "6", "match-test"])
    out = capsys.readouterr().out
    assert "TOTAL" in out and "precision" in out


def test_cli_triangulate(data_dir, capsys):
    main(["--data", data_dir, "--frames", "5", "triangulate", "--limit", "3"])
    out = capsys.readouterr().out
    assert "landmarks triangulated" in out
