"""Heatmap plotting for sweep CSVs — analog of the reference's
``benchmark/heatmap_scripts/plot_heatmaps.py``: a (Pr, Pc) grid of round-trip
times per (method, dtype, layout) configuration.

    python benchmarks/plot_heatmaps.py sweep_results.csv -o heatmaps/
"""

from __future__ import annotations

import argparse
import csv
import os
from collections import defaultdict


def load(path):
    with open(path) as f:
        return [r for r in csv.DictReader(f)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csv")
    ap.add_argument("-o", "--outdir", default="heatmaps")
    args = ap.parse_args()

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        raise SystemExit("matplotlib not available; install it to plot")

    rows = [r for r in load(args.csv) if r["status"] == "ok"
            and r["roundtrip_ms"]]
    groups = defaultdict(dict)
    for r in rows:
        key = (r["gdims"], r["method"], r["dtype"], r["axis_contiguous"])
        pr, pc = eval(r["pdims"])  # "(2, 2)" from our own CSV
        groups[key][(pr, pc)] = float(r["roundtrip_ms"])

    os.makedirs(args.outdir, exist_ok=True)
    for (gdims, method, dtype, ac), cells in groups.items():
        prs = sorted({p for p, _ in cells})
        pcs = sorted({c for _, c in cells})
        data = [[cells.get((p, c), float("nan")) for c in pcs] for p in prs]
        fig, ax = plt.subplots(figsize=(1 + len(pcs), 1 + len(prs)))
        im = ax.imshow(data, cmap="viridis")
        ax.set_xticks(range(len(pcs)), [str(c) for c in pcs])
        ax.set_yticks(range(len(prs)), [str(p) for p in prs])
        ax.set_xlabel("Pc")
        ax.set_ylabel("Pr")
        ax.set_title(f"{gdims} {method} {dtype} ac={ac} (round-trip ms)")
        for i, p in enumerate(prs):
            for j, c in enumerate(pcs):
                v = cells.get((p, c))
                if v is not None:
                    ax.text(j, i, f"{v:.2f}", ha="center", va="center",
                            color="white", fontsize=8)
        fig.colorbar(im)
        name = f"heatmap_{gdims}_{method}_{dtype}_ac{ac}.png".replace(" ", "")
        fig.savefig(os.path.join(args.outdir, name), bbox_inches="tight",
                    dpi=120)
        plt.close(fig)
        print(f"wrote {name}")


if __name__ == "__main__":
    main()
