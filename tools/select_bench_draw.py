"""Stamp the committed BENCH_SELF.json with its draw-selection provenance.

ADVICE r9 #5: the committed bench artifact was one hand-picked draw with
the selection rule living only in prose. This tool makes the choice
auditable from committed files alone: it takes the chosen draw's
BENCH_SELF snapshot (each bench.py run overwrites BENCH_SELF.json; keep
per-draw copies while drawing) plus the selection rule TEXT, embeds the
rule and the COMPLETE draw ledger (BENCH_DRAWS.jsonl — every draw's
totals/ratio/knobs, appended automatically by bench.py), and writes the
result as the repo's BENCH_SELF.json.

Usage:
    python tools/select_bench_draw.py <chosen_snapshot.json> "<rule text>"
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(snapshot_path: str, rule: str) -> int:
    with open(snapshot_path) as fh:
        chosen = json.load(fh)
    draws = []
    ledger = os.path.join(REPO, "BENCH_DRAWS.jsonl")
    with open(ledger) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            draws.append(
                {
                    k: d.get(k)
                    for k in (
                        "spark_total_sec",
                        "duck_control_total_sec",
                        "ratio",
                        "n_queries",
                        "n_errors",
                        "cache_leaks",
                        "shuffle_partitions",
                        "protocol",
                        "sf",
                    )
                }
            )
    chosen["draw_selection"] = {
        "rule": rule,
        "chosen_spark_total_sec": chosen.get("value"),
        "chosen_ratio": (
            round(chosen["value"] / chosen["duck_control_total"], 3)
            if chosen.get("duck_control_total")
            else None
        ),
        "all_draws": draws,
        "ledger": "BENCH_DRAWS.jsonl (per-query medians per draw)",
    }
    out = os.path.join(REPO, "BENCH_SELF.json")
    with open(out, "w") as fh:
        json.dump(chosen, fh, indent=1)
    print(
        f"wrote {out}: chosen total {chosen.get('value')}s over "
        f"{len(draws)} ledger draws"
    )
    return 0


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2]))
