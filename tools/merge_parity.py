"""Merge parity rows from auxiliary out-dirs (e.g. results/parity_cpu,
written by a CPU-platform queue running in parallel with the TPU queue)
into the canonical results/parity/parity.json (node rows, keyed
model+dataset) and link_parity.json (link rows, keyed
layer+dataset+feature), keeping the row with more seeds when both have
a cell, then rewrite PARITY.md / LINK_PARITY.md."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_parity import _write_link_markdown, _write_markdown  # noqa: E402


def _merge(main_dir, aux_dirs, fname, key):
    path = os.path.join(main_dir, fname)
    rows = []
    if os.path.exists(path):
        with open(path) as f:
            rows = json.load(f)
    by_cell = {key(r): r for r in rows}
    for aux in aux_dirs:
        p = os.path.join(aux, fname)
        if not os.path.exists(p):
            continue
        with open(p) as f:
            for r in json.load(f):
                k = key(r)
                if k not in by_cell or \
                        r.get("seeds", 0) > by_cell[k].get("seeds", 0):
                    by_cell[k] = r
    rows = sorted(by_cell.values(), key=key)
    if rows:
        with open(path, "w") as f:
            json.dump(rows, f, indent=1)
    return rows


def main():
    main_dir = sys.argv[1] if len(sys.argv) > 1 else "results/parity"
    aux_dirs = sys.argv[2:] or ["results/parity_cpu"]
    node_rows = _merge(main_dir, aux_dirs, "parity.json",
                       lambda r: (r["model"], r["dataset"]))
    if node_rows:
        _write_markdown(main_dir, node_rows)
    link_rows = _merge(main_dir, aux_dirs, "link_parity.json",
                       lambda r: (r["layer"], r["dataset"],
                                  r["feature"]))
    if link_rows:
        _write_link_markdown(main_dir, link_rows)
    print(f"{len(node_rows)} node rows, {len(link_rows)} link rows "
          f"-> {main_dir}")


if __name__ == "__main__":
    main()
