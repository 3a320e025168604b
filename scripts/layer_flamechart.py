#!/usr/bin/env python3
"""GGUF tensor-size treemap (reference scripts/layer_flamechart.py):
visualize where the bytes are in a model file.

    layer_flamechart.py <model.gguf> [out.html]

Writes a self-contained HTML treemap (no external JS; simple slice-and-dice
layout) and prints a text summary grouped by component.
"""

import html
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nemotron_tpu import gguf  # noqa: E402

PALETTE = ["#4e79a7", "#f28e2b", "#e15759", "#76b7b2", "#59a14f",
           "#edc948", "#b07aa1", "#ff9da7", "#9c755f", "#bab0ac"]


def group_of(name: str) -> str:
    if name.startswith("encoder.layers."):
        parts = name.split(".")
        return f"encoder.layers.{parts[2]}"
    return ".".join(name.split(".")[:2])


def main(argv: list[str]) -> int:
    if len(argv) < 2:
        print(__doc__, file=sys.stderr)
        return 1
    path = argv[1]
    out_path = argv[2] if len(argv) > 2 else path + ".sizes.html"
    g = gguf.read_gguf(path)

    sizes = {name: len(t.raw) for name, t in g.tensors.items()}
    total = sum(sizes.values())
    groups: dict[str, dict[str, int]] = defaultdict(dict)
    for name, sz in sizes.items():
        groups[group_of(name)][name] = sz

    # text summary
    print(f"{path}: {total / 1e6:.1f} MB in {len(sizes)} tensors")
    for gname, members in sorted(groups.items(),
                                 key=lambda kv: -sum(kv[1].values()))[:12]:
        gsz = sum(members.values())
        print(f"  {gname:35s} {gsz / 1e6:8.2f} MB  {gsz / total * 100:5.1f}%")

    # slice-and-dice treemap: groups as columns, tensors stacked inside
    W, H = 1200, 700
    parts = [f'<html><head><meta charset="utf-8"><title>{html.escape(path)}'
             f'</title></head><body style="font-family:monospace">'
             f'<h3>{html.escape(os.path.basename(path))} &mdash; '
             f'{total / 1e6:.1f} MB</h3>'
             f'<div style="position:relative;width:{W}px;height:{H}px;'
             f'border:1px solid #888">']
    x = 0.0
    for gi, (gname, members) in enumerate(
            sorted(groups.items(), key=lambda kv: -sum(kv[1].values()))):
        gsz = sum(members.values())
        gw = W * gsz / total
        y = 0.0
        color = PALETTE[gi % len(PALETTE)]
        for name, sz in sorted(members.items(), key=lambda kv: -kv[1]):
            th = H * sz / gsz
            tip = f"{name}: {sz / 1e6:.2f} MB ({sz / total * 100:.2f}%)"
            label = (html.escape(name.split(".")[-2][:18])
                     if gw > 60 and th > 12 else "")
            parts.append(
                f'<div title="{html.escape(tip)}" style="position:absolute;'
                f'left:{x:.1f}px;top:{y:.1f}px;width:{max(gw - 1, 0):.1f}px;'
                f'height:{max(th - 1, 0):.1f}px;background:{color};'
                f'outline:1px solid #fff;overflow:hidden;font-size:9px;'
                f'color:#fff">{label}</div>')
            y += th
        if gw > 40:
            parts.append(
                f'<div style="position:absolute;left:{x:.1f}px;top:-1.3em;'
                f'font-size:10px">{html.escape(gname)}</div>')
        x += gw
    parts.append("</div></body></html>")
    with open(out_path, "w") as f:
        f.write("".join(parts))
    print(f"wrote {out_path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
