#!/usr/bin/env python3
"""Round-ledger tally: SURVEY.md §2 inventory rows vs SparkEntry.

The r13 verdict flagged the close's hand-tallied counts drifting from
the actual tables (340/285 written vs 341/284 real). This script IS the
count now — run it, paste its numbers into the round close.

Usage: python3 tools/ledger.py [repo_root]
"""
import re
import sys
from collections import Counter

root = sys.argv[1] if len(sys.argv) > 1 else "."

# ---- SURVEY §2 rows -------------------------------------------------
survey = open(f"{root}/SURVEY.md", encoding="utf-8").read()
sec2 = survey.split("## §2", 1)[1]
sec2 = re.split(r"\n## §", sec2, 1)[0]

rows = {}
for m in re.finditer(
        r"^\| ([A-F]\d+[a-z]*) \| ([^|]+?) \|(.*)$",
        sec2, re.M):
    rid, name, rest = m.group(1), m.group(2).strip(" `"), m.group(3)
    if rid in rows:
        print(f"DUPLICATE row id {rid}", file=sys.stderr)
    check = rest.rsplit("|", 2)[-2].strip() if rest.count("|") >= 2 else rest
    if "✓oracle" in check or "oracle" in check.split("(")[0]:
        kind = "oracle"
    elif "rows-only" in check:
        kind = "rows-only"
    else:
        kind = "spec"
    rows[rid] = (name, kind)

fam = Counter(rid[0] for rid in rows)
kinds = Counter(kind for _, kind in rows.values())

# ---- SparkEntry maps ------------------------------------------------
entry = open(
    f"{root}/src/main/scala/graft/SparkEntry.scala", encoding="utf-8"
).read()
q_body = entry.split("def queries", 1)[1].split("def oracleSql", 1)[0]
o_body = entry.split("def oracleSql", 1)[1]
queries = set(re.findall(r'"([a-z0-9_]+)" ->', q_body))
oracles = set(re.findall(r'"([a-z0-9_]+)" ->', o_body))

print(f"SURVEY §2 rows: {len(rows)}  "
      f"({', '.join(f'{f}:{n}' for f, n in sorted(fam.items()))})")
print(f"  by check: oracle={kinds['oracle']} "
      f"rows-only={kinds['rows-only']} spec={kinds['spec']}")
print(f"SparkEntry.queries: {len(queries)}")
print(f"SparkEntry.oracleSql: {len(oracles)}")

missing_oracle = oracles - queries
if missing_oracle:
    print(f"oracleSql WITHOUT queries entry (driver would skip): "
          f"{sorted(missing_oracle)}")
