#!/usr/bin/env python
"""Build a single-page HTML dashboard from a run's --export-dir.

The file-product analog of the reference's rqt/rviz perspectives
(moving_object_detector_launch/rqt/detection_images.perspective — left/depth/
cluster image panes — and rviz marker displays, SURVEY.md §3.5): one row per
exported frame with the debug image panes (clusters, measured vs synthetic
flow, depth, velocity) and the marker table (CUBE + ARROW per object,
moving_object_to_marker:51-108 fields).

Usage: python scripts/make_report.py /tmp/out [-o /tmp/out/report.html]
"""

from __future__ import annotations

import argparse
import html
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from moving_object_detector_tpu.io import viz  # noqa: E402

PANES = [
    ("clusters", "clusters (label image)"),
    ("flow", "optical flow"),
    ("static_flow", "synthetic (static) flow"),
    ("depth", "depth"),
    ("velocity", "velocity"),
]


def read_ppm(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        data = f.read()
    m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", data)
    if not m:
        raise ValueError(f"not a binary PPM: {path}")
    w, h, maxval = map(int, m.groups())
    assert maxval == 255, path
    pix = np.frombuffer(data[m.end() : m.end() + w * h * 3], np.uint8)
    return pix.reshape(h, w, 3)


def marker_rows(markers: list[dict]) -> str:
    rows = []
    for mk in markers:
        if mk.get("action") == "deleteall" or mk.get("type") != "cube":
            continue
        p = mk.get("position", [0, 0, 0])
        s = mk.get("scale", [0, 0, 0])
        rows.append(
            "<tr><td>{}</td><td>{}</td>".format(
                html.escape(str(mk.get("ns", ""))), mk.get("id", "")
            )
            + "".join(f"<td>{v:+.2f}</td>" for v in (*p, *s))
            + "</tr>"
        )
    if not rows:
        return "<p class='none'>no objects</p>"
    head = (
        "<tr><th>ns</th><th>id</th><th>x</th><th>y</th><th>z</th>"
        "<th>sx</th><th>sy</th><th>sz</th></tr>"
    )
    return f"<table>{head}{''.join(rows)}</table>"


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("export_dir")
    ap.add_argument("-o", "--output", default=None)
    args = ap.parse_args()
    d = args.export_dir
    out_path = args.output or os.path.join(d, "report.html")

    frames = sorted(
        {
            f.split("_")[0]
            for f in os.listdir(d)
            if f.endswith(".ppm") or f.endswith("_markers.json")
        }
    )
    if not frames:
        raise SystemExit(f"no exported frames in {d}")

    sections = []
    for fr in frames:
        panes = []
        for key, title in PANES:
            ppm = os.path.join(d, f"{fr}_{key}.ppm")
            if not os.path.exists(ppm):
                continue
            png = f"{fr}_{key}.png"
            viz.write_png(os.path.join(d, png), read_ppm(ppm))
            panes.append(
                f"<figure><img src='{png}' alt='{title}'>"
                f"<figcaption>{title}</figcaption></figure>"
            )
        mk_path = os.path.join(d, f"{fr}_markers.json")
        table = ""
        if os.path.exists(mk_path):
            with open(mk_path) as f:
                table = marker_rows(json.load(f))
        sections.append(
            f"<section><h2>frame {int(fr)}</h2>"
            f"<div class='panes'>{''.join(panes)}</div>{table}</section>"
        )

    page = f"""<!doctype html><meta charset="utf-8">
<title>moving_object_detector_tpu report</title>
<style>
 body {{ font: 14px system-ui, sans-serif; margin: 1.5em; color: #222; }}
 .panes {{ display: flex; flex-wrap: wrap; gap: 8px; }}
 figure {{ margin: 0; }}
 img {{ max-width: 420px; image-rendering: pixelated; border: 1px solid #ccc; }}
 figcaption {{ font-size: 12px; color: #555; }}
 table {{ border-collapse: collapse; margin-top: 6px; }}
 td, th {{ border: 1px solid #bbb; padding: 2px 8px; font-size: 13px; }}
 section {{ margin-bottom: 2em; }}
 .none {{ color: #888; }}
</style>
<h1>moving_object_detector_tpu — run report</h1>
<p>{len(frames)} exported frames from <code>{html.escape(d)}</code>.
Panes mirror the reference's rqt detection_images perspective; the object
table mirrors the RViz marker display.</p>
{''.join(sections)}"""
    with open(out_path, "w") as f:
        f.write(page)
    print(f"wrote {out_path} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
