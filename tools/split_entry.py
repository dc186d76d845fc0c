#!/usr/bin/env python3
"""One-shot refactor: split SparkEntry.scala's two giant Map literals into
per-family registry objects under src/main/scala/graft/entry/, plus an
EntrySupport object holding the shared memoized-index helpers. The
aggregate SparkEntry keeps the same public surface (entry/queries/
oracleSql), so the driver contract and every test are unchanged.

String-aware scanner: triple-quoted strings, double-quoted strings with
escapes, // line comments. Entries are the depth-0 comma-separated chunks
of each Map(...) body; a chunk carries its preceding comment lines.
"""
import re
import sys
import os

SRC = "src/main/scala/graft/SparkEntry.scala"
OUTDIR = "src/main/scala/graft/entry"

FAMILIES = [
    ("cdc_", "CdcEntries"),
    ("search_dsl_json_", "SearchWireEntries"),
    ("search_", "SearchEntries"),
    ("monitor_", "SearchEntries"),
    (re.compile(r"^q\d+"), "AnalyticsEntries"),
    ("agg_", "AnalyticsEntries"),
    ("dedup_", "DedupEntries"),
    ("ann_", "AnnEntries"),
    ("text_", "TextEntries"),
    ("sample_", "TextEntries"),
    ("mm_", "MultimodalEntries"),
]

FAMILY_ORDER = [
    "CdcEntries", "SearchEntries", "SearchWireEntries", "AnalyticsEntries",
    "DedupEntries", "AnnEntries", "TextEntries", "MultimodalEntries",
]

FAMILY_DOC = {
    "CdcEntries": "CDC core (the reference's own surface).",
    "SearchEntries": "Search / query DSL, structured form + endpoints + monitors.",
    "SearchWireEntries": "Search wire twins: the JSON request-body executor surface.",
    "AnalyticsEntries": "Analytics / joins: TPC-H, colocated variants, product analytics.",
    "DedupEntries": "Deduplication (training-data pipeline).",
    "AnnEntries": "Similarity search (ANN) index builds + query paths.",
    "TextEntries": "Text analysis, sampling, and curation.",
    "MultimodalEntries": "Multimodal binary-column operators.",
}


def classify(key):
    for pat, fam in FAMILIES:
        if isinstance(pat, str):
            if key.startswith(pat):
                return fam
        elif pat.match(key):
            return fam
    raise SystemExit(f"unclassifiable key: {key}")


def split_chunks(body):
    """Split a Map body into depth-0 comma-separated chunks."""
    chunks, cur = [], []
    depth = 0
    i, n = 0, len(body)
    while i < n:
        c = body[i]
        if body.startswith('"""', i):
            j = body.find('"""', i + 3)
            # handle stripMargin quotes: closing delimiter may be followed
            # by more quotes (e.g. """ ... "x"""") — extend to the LAST
            # quote in the run
            while j + 3 < n and body[j + 3] == '"':
                j += 1
            cur.append(body[i:j + 3]); i = j + 3
            continue
        if c == '"':
            j = i + 1
            while j < n:
                if body[j] == '\\':
                    j += 2
                    continue
                if body[j] == '"':
                    break
                j += 1
            cur.append(body[i:j + 1]); i = j + 1
            continue
        if body.startswith("//", i):
            j = body.find("\n", i)
            j = n if j < 0 else j
            cur.append(body[i:j]); i = j
            continue
        if c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        elif c == "," and depth == 0:
            chunks.append("".join(cur)); cur = []
            i += 1
            continue
        cur.append(c); i += 1
    last = "".join(cur)
    if last.strip():
        chunks.append(last)
    return chunks


def key_of(chunk):
    m = re.search(r'"([A-Za-z0-9_]+)"\s*->', chunk)
    if not m:
        raise SystemExit(f"no key in chunk: {chunk[:200]}")
    return m.group(1)


def main():
    text = open(SRC).read()
    lines = text.split("\n")

    def find_line(pred, start=0):
        for idx in range(start, len(lines)):
            if pred(lines[idx]):
                return idx
        raise SystemExit("marker not found")

    import_end = find_line(lambda l: l.startswith("object SparkEntry {"))
    header = "\n".join(lines[: find_line(lambda l: l.startswith("/** Driver contract"))])
    entry_def = find_line(lambda l: l.strip().startswith("def entry(spark: SparkSession)"))
    helpers_start = entry_def + 2  # def line + body line
    q_start = find_line(lambda l: l.startswith("  def queries: Map[String, (SparkSession, String) => DataFrame] = Map("))
    o_start = find_line(lambda l: l.startswith("  def oracleSql: Map[String, String] = Map("))
    # closing "  )" of the queries map: last such line before o_start
    q_close = max(i for i in range(q_start, o_start) if lines[i] == "  )")
    o_close = max(i for i in range(o_start, len(lines)) if lines[i] == "  )")

    helper_block = lines[helpers_start:q_start]
    # strip trailing blank lines
    while helper_block and not helper_block[-1].strip():
        helper_block.pop()
    # drop the object-level `private ` modifier (members become public
    # inside the private[graft] support object)
    helper_block = [re.sub(r"^(  )private ", r"\1", l) for l in helper_block]

    q_body = "\n".join(lines[q_start + 1:q_close])
    o_body = "\n".join(lines[o_start + 1:o_close])

    q_chunks = split_chunks(q_body)
    o_chunks = split_chunks(o_body)
    q_by_fam, o_by_fam = {}, {}
    for ch in q_chunks:
        q_by_fam.setdefault(classify(key_of(ch)), []).append(ch)
    for ch in o_chunks:
        o_by_fam.setdefault(classify(key_of(ch)), []).append(ch)

    q_keys = {key_of(c) for c in q_chunks}
    o_keys = {key_of(c) for c in o_chunks}
    print(f"queries: {len(q_chunks)} entries, oracleSql: {len(o_chunks)}; "
          f"oracle keys not in queries: {sorted(o_keys - q_keys)}")

    os.makedirs(OUTDIR, exist_ok=True)

    doc_note = ("Split out of the monolithic SparkEntry registry (round 10)\n"
                "  * purely mechanically — entry bodies and oracle SQL are\n"
                "  * byte-identical; SparkEntry aggregates the family maps.")

    support = [header, "",
               "/** Shared cross-entry support: memoized index artifacts, derived",
               "  * frames, and oracle-SQL fragments the family registries consume.",
               f"  * {doc_note}",
               "  */",
               "private[graft] object EntrySupport {"]
    support += helper_block + ["}", ""]
    open(f"{OUTDIR}/EntrySupport.scala", "w").write("\n".join(support))

    for fam in FAMILY_ORDER:
        qs = q_by_fam.get(fam, [])
        osql = o_by_fam.get(fam, [])
        out = [header, "", "import graft.EntrySupport._", "",
               f"/** {FAMILY_DOC[fam]}",
               f"  * {doc_note}",
               "  */",
               f"private[graft] object {fam} {{",
               "",
               "  val queries: Map[String, (SparkSession, String) => DataFrame] = Map("]
        out.append(",\n".join(qs))
        out.append("  )")
        out.append("")
        out.append("  val oracleSql: Map[String, String] = Map(")
        out.append(",\n".join(osql))
        out.append("  )")
        out.append("}")
        out.append("")
        open(f"{OUTDIR}/{fam}.scala", "w").write("\n".join(out))
        print(f"{fam}: {len(qs)} queries, {len(osql)} oracles")

    agg = [header, "",
           "/** Driver contract: one `queries` entry per operator in SURVEY.md §2, with",
           "  * a DuckDB-equivalent `oracleSql` wherever the semantics are",
           "  * SQL-expressible. Column names and row ordering match the oracle exactly",
           "  * (the driver hash-compares values under name-sorted columns).",
           "  *",
           "  * The registry itself lives in per-family objects under `graft/entry/`",
           "  * (CdcEntries, SearchEntries, SearchWireEntries, AnalyticsEntries,",
           "  * DedupEntries, AnnEntries, TextEntries, MultimodalEntries) with shared",
           "  * memoized artifacts in EntrySupport; this object aggregates them so the",
           "  * driver-facing surface is unchanged.",
           "  */",
           "object SparkEntry {",
           "",
           "  /** Flagship: CDC latest-state materialization (the reference pipeline's",
           "    * core semantic) on sf0.001.",
           "    */",
           "  def entry(spark: SparkSession): DataFrame =",
           "    queries(\"cdc_latest_state\")(spark, \"/root/testdata/sf0.001\")",
           "",
           "  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =",
           "    " + " ++\n      ".join(f"{f}.queries" for f in FAMILY_ORDER),
           "",
           "  lazy val oracleSql: Map[String, String] =",
           "    " + " ++\n      ".join(f"{f}.oracleSql" for f in FAMILY_ORDER),
           "}",
           ""]
    open(SRC, "w").write("\n".join(agg))
    print("SparkEntry.scala rewritten as aggregator")


if __name__ == "__main__":
    main()
