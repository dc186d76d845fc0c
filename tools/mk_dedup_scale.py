#!/usr/bin/env python3
"""Assemble BENCH_r11_sf10.json's dedup section from the three filtered
bench runs (base sf0.1 / 10x mutated / 100x mutated, all local[32], each
run alone).

Usage: python3 tools/mk_dedup_scale.py <base.json> <10x.json> <100x.json> <out.json>
"""
import json
import math
import sys


def load(p):
    return json.load(open(p))["queries"]


def main():
    base, x10, x100, out = sys.argv[1:5]
    b, t10, t100 = load(base), load(x10), load(x100)
    queries = {}
    for k in sorted(b):
        row = {"sf0_1_sec": b[k]}
        if k in t10:
            row["sf1ish_mut_sec"] = t10[k]
            row["ratio_10x"] = round(t10[k] / b[k], 2)
            row["exponent_10x"] = round(math.log10(t10[k] / b[k]), 3)
        if k in t100:
            row["sf10ish_mut_sec"] = t100[k]
            row["ratio_100x"] = round(t100[k] / b[k], 2)
            row["exponent_100x"] = round(math.log(t100[k] / b[k]) / math.log(100), 3)
        queries[k] = row
    doc = {
        "note": (
            "100x dedup scale evidence (r11): constant-dup-density mutated corpora "
            "from graft.ScaleData's mutate mode (uniform 3/4-rate replica-keyed token "
            "mutation for documents; per-replica signed coordinate permutation for "
            "embeddings). /tmp/sf1ish_mut = 10x (100k docs / 20k vectors), "
            "/tmp/sf10ish_mut = 100x (500k docs / 200k vectors). All three points "
            "SPARK_GRAFT_CPUS=32, each bench run alone, denominators from the same "
            "filtered-run protocol at base sf0.1. exponent_100x = log100(t100/t1): "
            "0 flat, 1 linear. Embedding-space true-pair volume grows faster than "
            "linearly BY NATURE of iid fixed-dim vectors at a 2.8-sigma threshold "
            "(see ScaleData's doc) -- the text keys hold near-constant density, so "
            "their exponents measure the operator; the embedding keys measure "
            "time-vs-emitted-output with output itself growing superlinearly."
        ),
        "queries": queries,
    }
    json.dump(doc, open(out, "w"), indent=1)
    print(json.dumps({k: v for k, v in queries.items()}, indent=1))


if __name__ == "__main__":
    main()
