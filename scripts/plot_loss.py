#!/usr/bin/env python
"""Plot training curves from a metrics CSV (reference notebook-plots analog).

Usage: python scripts/plot_loss.py metrics.csv [-o loss_curves.png]
"""

import argparse
import csv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csv_path")
    ap.add_argument("-o", "--out", default="loss_curves.png")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = list(csv.DictReader(open(args.csv_path)))
    steps = [int(r["step"]) for r in rows]

    fig, axes = plt.subplots(1, 3, figsize=(14, 4))
    for ax, key, title in zip(
        axes, ("loss", "bce", "kl"), ("negative ELBO / sample", "BCE", "KL")
    ):
        ax.plot(steps, [float(r[key]) for r in rows], label="train")
        val = [(s, float(r[f"val_{key}"])) for s, r in zip(steps, rows) if r.get(f"val_{key}")]
        if val:
            ax.plot(*zip(*val), "o--", label="val")
        ax.set_title(title)
        ax.set_xlabel("step")
        ax.legend()
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
