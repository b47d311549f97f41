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
print(f"queries={queries} oracle={oracle} specs={tests} -> README.md")
