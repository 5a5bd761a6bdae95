"""Merge parity rows from auxiliary out-dirs (e.g. results/parity_cpu,
written by a CPU-platform queue running in parallel with the TPU queue)
into the canonical results/parity/parity.json, keeping the row with
more seeds when both have a cell, then rewrite PARITY.md."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_parity import _write_markdown  # noqa: E402


def main():
    main_dir = sys.argv[1] if len(sys.argv) > 1 else "results/parity"
    aux_dirs = sys.argv[2:] or ["results/parity_cpu"]
    path = os.path.join(main_dir, "parity.json")
    rows = []
    if os.path.exists(path):
        with open(path) as f:
            rows = json.load(f)
    by_cell = {(r["model"], r["dataset"]): r for r in rows}
    for aux in aux_dirs:
        p = os.path.join(aux, "parity.json")
        if not os.path.exists(p):
            continue
        with open(p) as f:
            for r in json.load(f):
                key = (r["model"], r["dataset"])
                if key not in by_cell or \
                        r.get("seeds", 0) > by_cell[key].get("seeds", 0):
                    by_cell[key] = r
    rows = sorted(by_cell.values(),
                  key=lambda r: (r["model"], r["dataset"]))
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)
    _write_markdown(main_dir, rows)
    print(f"{len(rows)} rows -> {path}")


if __name__ == "__main__":
    main()
