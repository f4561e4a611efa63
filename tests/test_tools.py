"""Tooling smoke tests: sweep runner case parsing + heatmap plotting."""

import csv
import os
import runpy
import sys


def test_sweep_case_matrix_parsing():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "benchmarks"))
    import run_sweep
    cfg = {"gdims": [[8, 8, 8]], "pdims": [[2, 2], [1, 4]],
           "method": ["all_to_all"], "dtype": ["float32"],
           "axis_contiguous": [False, True],
           "halo_extents": [[0, 0, 0]], "padding": [[0, 0, 0]]}
    cases = list(run_sweep.parse_case_matrix(cfg))
    assert len(cases) == 4
    assert cases[0]["gdims"] == [8, 8, 8]


def test_heatmap_plotting(tmp_path):
    pytest_skip = None
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        import pytest
        pytest.skip("matplotlib unavailable")
    csv_path = tmp_path / "sweep.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=[
            "gdims", "pdims", "method", "dtype", "axis_contiguous",
            "halo_extents", "padding", "status", "error", "roundtrip_ms"])
        w.writeheader()
        for pd, ms in [("(1, 4)", "0.5"), ("(2, 2)", "0.4"), ("(4, 1)", "0.6")]:
            w.writerow(dict(gdims="8x8x8", pdims=pd, method="all_to_all",
                            dtype="float32", axis_contiguous="False",
                            halo_extents="0x0x0", padding="0x0x0",
                            status="ok", error="", roundtrip_ms=ms))
    outdir = tmp_path / "maps"
    argv = sys.argv
    sys.argv = ["plot_heatmaps.py", str(csv_path), "-o", str(outdir)]
    try:
        runpy.run_path(os.path.join(os.path.dirname(__file__), "..",
                                    "benchmarks", "plot_heatmaps.py"),
                       run_name="__main__")
    finally:
        sys.argv = argv
    pngs = list(outdir.glob("*.png"))
    assert len(pngs) == 1


def test_spectral_ops_example_runs():
    # example smoke: the public SpectralOperators walkthrough must execute
    # end-to-end on the virtual mesh and pass its own closed-form asserts
    import runpy
    import sys
    argv = sys.argv
    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "spectral_ops.py")
    sys.argv = ["spectral_ops.py"]
    try:
        runpy.run_path(path, run_name="__main__")
    finally:
        sys.argv = argv
