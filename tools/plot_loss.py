#!/usr/bin/env python
"""Render training loss curves from a run's metrics.jsonl to a PNG.

The reference surfaces its loss curves only through live TensorBoard
(`/root/reference/kernel_train.py:318-321`); this produces the same
curves as a committed artifact from the JSONL fallback stream the
trainer always writes (utils/logging.py).

Two panels (Sinkhorn loss spans orders of magnitude -> log scale; pM
lives in [0, ~1] -> its own panel; never a dual-axis chart).

Usage: python tools/plot_loss.py RUN_DIR/log/metrics.jsonl out.png
"""

import json
import sys


def main() -> int:
    src, dst = sys.argv[1], sys.argv[2]
    series: dict[str, tuple[list, list]] = {}
    with open(src) as f:
        for line in f:
            rec = json.loads(line)
            xs, ys = series.setdefault(rec["tag"], ([], []))
            xs.append(rec["step"])
            ys.append(rec["value"])

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    panels = [t for t in ("Sinkhorn Loss", "pM") if t in series]
    colors = {"Sinkhorn Loss": "#2a78d6", "pM": "#eb6834"}
    fig, axes = plt.subplots(
        len(panels), 1, figsize=(7, 2.6 * len(panels)),
        sharex=True, facecolor="#fcfcfb",
    )
    if len(panels) == 1:
        axes = [axes]
    for ax, tag in zip(axes, panels):
        xs, ys = series[tag]
        ax.plot(xs, ys, color=colors.get(tag, "#2a78d6"), linewidth=2)
        ax.set_title(tag, loc="left", fontsize=11, color="#0b0b0b")
        ax.set_facecolor("#fcfcfb")
        if tag == "Sinkhorn Loss" and min(ys) > 0:
            ax.set_yscale("log")
        ax.grid(True, color="#e6e5e0", linewidth=0.6)
        for spine in ("top", "right"):
            ax.spines[spine].set_visible(False)
        ax.tick_params(colors="#52514e", labelsize=9)
    axes[-1].set_xlabel("training step", color="#52514e", fontsize=9)
    fig.tight_layout()
    fig.savefig(dst, dpi=140)
    print(f"wrote {dst} ({', '.join(panels)})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
