"""Extract Rule("match","strip"[,"add"]) tables from the reference's
analysis-extra stemmers as Python tuples. Data extraction only."""
import re, sys

src = open(sys.argv[1], encoding="utf-8").read()
name = sys.argv[2]
rules = re.findall(r'Rule\(\s*"([^"]*)",\s*"([^"]*)"(?:,\s*"([^"]*)")?\s*\)', src)
rows, row = [], "    "
for m, s, a in rules:
    item = f'("{m}", "{s}", "{a or ""}"), '
    if len(row) + len(item) > 76:
        rows.append(row.rstrip()); row = "    "
    row += item
rows.append(row.rstrip())
print(f"{name} = (\n" + "\n".join(rows) + "\n)")
print(f"# {len(rules)} rules", file=sys.stderr)
