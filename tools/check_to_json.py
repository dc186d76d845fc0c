#!/usr/bin/env python3
"""Convert tools/check.py stdout into the CORRECTNESS_*.json record shape
(the builder-side wide/sf1 gate artifacts committed each round).

Usage: python3 tools/check.py <sfdir> <outdir> | \
       python3 tools/check_to_json.py <record.json> "<note>"
"""
import json
import sys

def main():
    record, note = sys.argv[1], sys.argv[2]
    results = {}
    skipped = []
    n_pass = n_fail = 0
    for line in sys.stdin:
        line = line.rstrip("\n")
        if line.startswith("pass     "):
            body = line[len("pass     "):]
            name, rows = body.rsplit(" (", 1)
            results[name] = {"status": "pass", "rows": int(rows.rstrip(" rows)"))}
            n_pass += 1
        elif line.startswith("FAIL     "):
            body = line[len("FAIL     "):]
            name, problems = body.split(": ", 1)
            results[name] = {"status": "FAIL", "problems": problems}
            n_fail += 1
        elif line.startswith("rowsonly "):
            body = line[len("rowsonly "):]
            name, rest = body.split(": ", 1)
            try:
                results[name] = {"status": "rowsonly", "rows": int(rest.split(" ")[0])}
            except ValueError:
                results[name] = {"status": "rowsonly", "problems": rest}
        elif line.startswith("skipped  "):
            skipped.append(line[len("skipped  "):].split(" ")[0])
        print(line)
    out = {"note": note, "results": dict(sorted(results.items()))}
    if skipped:
        out["skipped_quadratic_oracles"] = sorted(skipped)
    with open(record, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[check_to_json] wrote {record}: {n_pass} pass, {n_fail} fail, "
          f"{sum(1 for v in results.values() if v['status']=='rowsonly')} rowsonly, {len(skipped)} skipped")

if __name__ == "__main__":
    main()
