"""Summarize a scaling-campaign JSONL log (best steady / best raw / means).

Usage: python scripts/campaign_summary.py [log.jsonl] [--md]
"""

from __future__ import annotations

import json
import sys

STEADY = 0.85


def load(path: str) -> list[dict]:
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            if "error" in r or "efficiency" not in r:
                continue
            rows.append(r)
    return rows


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/campaign_r5b.log"
    rows = load(path)
    if not rows:
        print("no samples")
        return
    steady = [r for r in rows if r["spin_ceiling_min"] >= STEADY]
    near = [r for r in rows if r["spin_ceiling_min"] >= 0.80]
    best = max(rows, key=lambda r: r["efficiency"])
    eff = [r["efficiency"] for r in rows]
    out = {
        "samples": len(rows),
        "steady_count": len(steady),
        "best_steady": (max(steady, key=lambda r: r["efficiency"])
                        if steady else None),
        "best_near_steady_080": (max(near, key=lambda r: r["efficiency"])
                                 if near else None),
        "best_raw": best,
        "mean_eff": round(sum(eff) / len(eff), 3),
        "mean_norm": round(sum(r["normalized_efficiency"] for r in rows)
                           / len(rows), 3),
        "best_t8": min(float(r["sec"]["8"]) for r in rows),
        "best_t32": min(float(r["sec"]["32"]) for r in rows),
    }
    print(json.dumps(out, indent=1))
    if "--md" in sys.argv:
        print("\n| round | order | t8 (s) | t32 (s) | raw eff | norm eff "
              "| spin min | membw pre/post (GB/s) |")
        print("|---|---|---|---|---|---|---|---|")
        for i, r in enumerate(rows):
            print(f"| {i} | {r['order']} | {r['sec']['8']} | {r['sec']['32']}"
                  f" | {r['efficiency']} | {r['normalized_efficiency']}"
                  f" | {r['spin_ceiling_min']} | {r['membw_gbps_pre']} /"
                  f" {r['membw_gbps_post']} |")


if __name__ == "__main__":
    main()
