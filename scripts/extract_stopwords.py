"""Extract an embedded snowball/plain stopword list from a reference analyzer
.kt file (the public BSD-licensed snowball stop lists) and print a Python
frozenset literal. Data extraction only — usage: 
  python scripts/extract_stopwords.py <path.kt> [varname]
Snowball format: '|' starts a comment; first whitespace token of a line is
the stop word.
"""
import re, sys

path = sys.argv[1]
src = open(path, encoding="utf-8").read()
m = re.search(r'DEFAULT_STOPWORD_DATA: String =\s*"""(.*?)"""', src, re.S)
if not m:
    m = re.search(r'DEFAULT_STOP_SET_DATA: String =\s*"""(.*?)"""', src, re.S)
words = []
for line in m.group(1).splitlines():
    line = line.split("|", 1)[0].strip()
    if line:
        words.append(line.split()[0])
name = sys.argv[2] if len(sys.argv) > 2 else "STOP_WORDS"
out = [f"{name} = frozenset(("]
row = "    "
for w in words:
    item = f'"{w}", '
    if len(row) + len(item) > 76:
        out.append(row.rstrip())
        row = "    "
    row += item
if row.strip():
    out.append(row.rstrip())
out.append("))")
print("\n".join(out))
print(f"# {len(words)} words", file=sys.stderr)
