#!/usr/bin/env python3
"""Mechanically refresh drift-prone counts in README.md.

The numbers are derived from the source tree, never hand-edited:
  - queries         = entries in SparkEntry.queries        (`-> ((s, dir)`)
  - oracle-checked  = entries in SparkEntry.oracleSql      (`"<key>" ->`)
  - specs           = `test(` occurrences under src/test

Run after adding a query or a spec:  python3 tools/refresh_docs.py
"""
import pathlib
import re

root = pathlib.Path(__file__).resolve().parent.parent
entry = (root / "src/main/scala/graft/SparkEntry.scala").read_text()

queries = len(re.findall(r"-> \(\(s, dir\)", entry))
oracle_section = entry[entry.index("def oracleSql"):]
oracle = len(re.findall(r'^\s*"[qx]\w+" ->', oracle_section, re.M))
tests = sum(
    len(re.findall(r"^\s*test\(", f.read_text(), re.M))
    # rglob, not glob: spec files under subpackages (graft/streaming/…)
    # must count too or the README silently undercounts the suite
    for f in (root / "src/test/scala/graft").rglob("*.scala"))

readme_path = root / "README.md"
readme = readme_path.read_text()
readme, n1 = re.subn(
    r"\d+ queries \(\d+ DuckDB-oracle-checked",
    f"{queries} queries ({oracle} DuckDB-oracle-checked", readme)
readme, n2 = re.subn(r"# \d+ specs", f"# {tests} specs", readme)
assert n1 == 1 and n2 == 1, f"README markers missing (found {n1}/{n2})"
readme_path.write_text(readme)

# SURVEY §2.10's registry id index: every SparkEntry.queries key,
# 3 per line, between the registry-index markers. DocsSyncSpec pins
# that each key appears in SURVEY §2 — this block is what makes the
# pin mechanically satisfiable without hand-editing the tables.
keys = sorted(set(re.findall(r'"([qx]\w+)" -> \(\(s, dir\)', entry)))
assert len(keys) == queries, f"key scrape {len(keys)} != query count {queries}"
lines = ["    " + "  ".join(keys[i:i + 3]) for i in range(0, len(keys), 3)]
survey_path = root / "SURVEY.md"
survey = survey_path.read_text()
begin, end = "<!-- registry-index:begin -->", "<!-- registry-index:end -->"
b, e = survey.index(begin), survey.index(end)
survey = survey[:b + len(begin)] + "\n\n" + "\n".join(lines) + "\n\n" + survey[e:]
survey_path.write_text(survey)
print(f"queries={queries} oracle={oracle} specs={tests} "
      f"-> README.md, SURVEY.md index ({len(keys)} keys)")
