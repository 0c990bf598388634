#!/usr/bin/env python3
"""Regenerate SURVEY.md §8.1 — the mechanical catalog audit table.

One row per `SparkEntry.queries` key: the query's one-line purpose (first
line of its `// ---- qNN` comment block), the graft operators/functions its
body references, and whether it is value-oracled (`oracleSql` entry) or
rows-only. Parsed straight from Queries.scala so the table cannot drift
from the code; run after every catalog change:

    python3 scripts/gen_survey_catalog.py        # rewrites SURVEY.md in place
    python3 scripts/gen_survey_catalog.py --stdout
"""
import re
import sys

SRC = "src/main/scala/graft/Queries.scala"
SURVEY = "SURVEY.md"
BEGIN = "<!-- BEGIN GENERATED CATALOG TABLE (scripts/gen_survey_catalog.py) -->"
END = "<!-- END GENERATED CATALOG TABLE -->"

# graft object names whose use inside a query body marks the operator under
# test (package prefixes stripped). Built from the package listing.
OPERATOR_RE = re.compile(
    r"\b(?:graft\.(?:operators|functions|streaming|plans|multimodal)\.)?"
    r"(AsOfJoin|Audit|Bucketing|Centrality|Chunking|Cleaning|ConnectedComponents|"
    r"Dedup|Diagnostics|Encoding|Funnel|Importance|Layout|Linkage|Merge|Packing|"
    r"Retention|Rollup|Sampling|Similarity|Sketches|SkewJoin|TfIdf|"
    r"AggFunctions|GeoFunctions|HashFunctions|PiiFunctions|TextFunctions|"
    r"VectorFunctions|Streaming\w+|Multimodal|CosineSimilarity|MinHashSig|"
    r"NfcNormalize|EnrichedTokenCount|TopKAgg|KmvAgg)\b")


def main():
    src = open(SRC).read()

    # catalog key -> qNN val name, in declaration order of the `all` map
    entries = re.findall(r'"(q\d+[a-z0-9_]*)"\s*->\s*(q\d+)\b,?', src)
    # first mapping block is `all`; oracle keys from the second block
    oracle_keys = set(re.findall(r'"(q\d+[a-z0-9_]*)"\s*->\s*q\d+Sql\b', src))
    seen, catalog = set(), []
    for key, q in entries:
        if key in seen:
            continue
        seen.add(key)
        catalog.append((key, q))

    # qNN -> (description, body). A header may name several queries that
    # share one block ("// ---- q26/q27"): each name gets the block.
    blocks = {}
    for m in re.finditer(
        r"// -{10,} (q\d+[a-z]?(?:/q\d+[a-z]?)*)\n(.*?)(?=\n  // -{10,} q|\n  // -{30,}\n\n  val all)",
        src, re.S):
        header, block = m.group(1), m.group(2)
        comment_lines = [
            line.strip().lstrip("/ ").strip()
            for line in block.splitlines() if line.strip().startswith("//")
        ]
        desc = ""
        for line in comment_lines:
            desc += (" " if desc else "") + line
            if len(desc) > 90:
                break
        desc = re.sub(r"\s+", " ", desc)[:140].rstrip()
        body = re.sub(r"//[^\n]*", "", block)  # ops from code, not comments
        ops = sorted(set(OPERATOR_RE.findall(body)))
        for q in header.split("/"):
            blocks[q] = (desc, ops)

    rows = []
    for key, q in catalog:
        desc, ops = blocks.get(q, ("", []))
        oracle = "value" if key in oracle_keys else "rows-only"
        rows.append(
            f"| {key} | {desc or '—'} | {', '.join(ops) or 'DataFrame ops'} | {oracle} |")

    table = "\n".join([
        BEGIN,
        "",
        f"{len(rows)} catalog queries; \"value\" = DuckDB oracle hash-checks "
        "every cell, \"rows-only\" = driver row-count check. Regenerate with "
        "`python3 scripts/gen_survey_catalog.py` after any catalog change.",
        "",
        "| Catalog query | Purpose (from the in-code comment) | graft modules exercised | Oracle |",
        "|---|---|---|---|",
        *rows,
        "",
        END,
    ])

    if "--stdout" in sys.argv:
        print(table)
        return
    survey = open(SURVEY).read()
    if BEGIN in survey:
        survey = re.sub(re.escape(BEGIN) + ".*?" + re.escape(END), table,
                        survey, flags=re.S)
    else:
        survey = survey.rstrip() + "\n\n### 8.1 Mechanical catalog audit table\n\n" + table + "\n"
    open(SURVEY, "w").write(survey)
    print(f"wrote {len(rows)} rows to {SURVEY}")


if __name__ == "__main__":
    main()
