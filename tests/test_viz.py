"""Visualization subsystem: figure rendering + the one-command driver.

Twin targets: model/fmSupportLib.py:292-320 (fmPlotPSD recipe),
model/fmMonoAnim.py (PSD animation -> waterfall), data/example.gnuplot:14-22
(RDS trace overlay -> eye diagram / gnuplot script)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from real_time_sdr_tpu.utils import viz

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.smoke
def test_figure_functions_render(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(512 * 24).astype(np.float32)
    p1 = viz.psd_figure(str(tmp_path / "psd.png"),
                        [(x, 48000.0, 1.0, "noise")])
    p2 = viz.waterfall(str(tmp_path / "wf.png"), x, 48000.0, n_rows=8)
    p3 = viz.eye_diagram(str(tmp_path / "eye.png"), x, sps=39)
    p4 = viz.constellation(str(tmp_path / "c.png"), x, sps=39, offset=3)
    p5 = viz.write_gnuplot_overlay(str(tmp_path), ["a", "b"], title="ov")
    for p in (p1, p2, p3, p4, p5):
        assert os.path.getsize(p) > 200, p
    with open(p5) as f:
        s = f.read()
    assert "a.dat" in s and "b.dat" in s and "plot " in s


@pytest.mark.slow
def test_viz_driver_synthetic(tmp_path):
    """python -m real_time_sdr_tpu.viz 0 --cpu renders the full sheet."""
    env = dict(os.environ,
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    r = subprocess.run(
        [sys.executable, "-m", "real_time_sdr_tpu.viz", "0", "--cpu",
         "--blocks", "8", "--alt", "--out", str(tmp_path)],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    for name in ("psd_stages.png", "waterfall.png", "rds_eye.png",
                 "rds_constellation.png", "rds_eye.gnuplot",
                 "rds_clean.dat", "alt_rds.png"):
        assert (tmp_path / name).exists(), name
