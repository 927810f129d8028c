"""Dependency-free SVG loss-curve plots.

The reference writes matplotlib loss curves (demo_real_images.py:122-133);
matplotlib is not in this image, so training curves render as standalone SVG —
viewable in any browser, no runtime deps.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

_COLORS = ("#1f77b4", "#d62728", "#2ca02c", "#9467bd", "#ff7f0e", "#8c564b")


def plot_history_svg(
    history: Dict[str, Sequence[float]],
    filename: str,
    keys: Optional[Sequence[str]] = None,
    title: str = "training curves",
    width: int = 720,
    height: int = 420,
) -> str:
    """Render selected history series as an SVG line chart; returns the SVG."""
    keys = [k for k in (keys or sorted(history))
            if history.get(k) and all(v == v for v in history[k])]
    margin = 50
    w, h = width - 2 * margin, height - 2 * margin
    all_vals = [v for k in keys for v in history[k]]
    if not all_vals:
        raise ValueError("nothing to plot")
    vmin, vmax = min(all_vals), max(all_vals)
    if vmax == vmin:
        vmax = vmin + 1.0
    n = max(len(history[k]) for k in keys)

    def sx(i):
        return margin + (i / max(n - 1, 1)) * w

    def sy(v):
        return margin + (1 - (v - vmin) / (vmax - vmin)) * h

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" font-family="sans-serif" font-size="12">',
        f'<rect width="{width}" height="{height}" fill="white"/>',
        f'<text x="{width / 2}" y="20" text-anchor="middle" '
        f'font-size="15">{title}</text>',
        f'<line x1="{margin}" y1="{margin + h}" x2="{margin + w}" '
        f'y2="{margin + h}" stroke="#333"/>',
        f'<line x1="{margin}" y1="{margin}" x2="{margin}" y2="{margin + h}" '
        f'stroke="#333"/>',
        f'<text x="{margin - 6}" y="{sy(vmax) + 4}" text-anchor="end">'
        f'{vmax:.3g}</text>',
        f'<text x="{margin - 6}" y="{sy(vmin) + 4}" text-anchor="end">'
        f'{vmin:.3g}</text>',
        f'<text x="{margin + w}" y="{margin + h + 16}" text-anchor="end">'
        f'epoch {n - 1}</text>',
    ]
    for ci, k in enumerate(keys):
        color = _COLORS[ci % len(_COLORS)]
        pts = " ".join(
            f"{sx(i):.1f},{sy(v):.1f}" for i, v in enumerate(history[k])
        )
        parts.append(
            f'<polyline points="{pts}" fill="none" stroke="{color}" '
            f'stroke-width="1.5"/>'
        )
        parts.append(
            f'<text x="{margin + 8}" y="{margin + 16 + 16 * ci}" '
            f'fill="{color}">{k}</text>'
        )
    parts.append("</svg>")
    svg = "\n".join(parts)
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    with open(filename, "w") as f:
        f.write(svg)
    return svg
