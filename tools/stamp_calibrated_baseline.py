#!/usr/bin/env python
"""Re-stamp bench_calibrated_baseline.json from a driver bench archive.

Round-opening step (with committing the driver sidecars): the calibrated
drift band in bench.py compares each run's `queries_calibrated` medians
against the PREVIOUS round's archived series, so after round N's
`BENCH_r{N}.json` lands, run

    python tools/stamp_calibrated_baseline.py BENCH_r{N}.json

and commit the refreshed baseline.  Keeping the stamp mechanical (one
command, provenance recorded) closes the gap the r13 verdict flagged in
the measurement protocol: the band must always compare exactly one
round back, not whatever baseline happened to be lying around.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path


def main() -> None:
    if len(sys.argv) != 2:
        sys.exit("usage: stamp_calibrated_baseline.py BENCH_r{N}.json")
    src = Path(sys.argv[1])
    with open(src) as f:
        arch = json.load(f)
    parsed = arch.get("parsed", arch)  # driver archive wraps the line
    series = parsed.get("queries_calibrated")
    if not series:
        sys.exit(f"{src}: no queries_calibrated series (pre-r13 archive?)")
    m = re.search(r"_r(\d+)", src.name)
    out = {
        "round": int(m.group(1)) if m else None,
        "series": "queries_calibrated",
        "probe_def": parsed.get("extra_probe_def")
        or "range5M-hash-2agg noop, interleaved before every rep",
        "queries_calibrated": series,
    }
    dst = Path(__file__).resolve().parent.parent / "bench_calibrated_baseline.json"
    with open(dst, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"stamped {dst.name} from {src.name} (round {out['round']}, "
          f"{len(series)} queries)")


if __name__ == "__main__":
    main()
