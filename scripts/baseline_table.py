"""Render perf/sweep_results.json as the BASELINE.md measured-baseline
markdown table (stdout)."""
import json
import os
import sys

HERE = os.path.dirname(__file__)
path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    HERE, "..", "perf", "sweep_results.json")
rows = json.load(open(path))

print("| ne | np | dist | struct | push ms | rebuild ms | "
      "migrate-churn ms | padded % | rebuild vs SCS |")
print("|---|---|---|---|---|---|---|---|---|")
for r in rows:
    print(f"| {r['ne']} | {r['np']:,} | {r['dist']} | {r['struct']} | "
          f"{r['pseudo_push_ms']:.1f} | {r['rebuild_ms']:.0f} | "
          f"{r['migrate_churn_ms']:.0f} | "
          f"{100 * r['padded_fraction']:.0f} | "
          f"{r.get('rebuild_vs_scs', 1.0):.2f} |")
