"""Extract (input, expected) pairs from a reference analyzer test .kt file's
checkOneTerm(a, "in", "out") / assertAnalyzesTo(a, "in", arrayOf("out"...))
calls, printed as a Python list literal. Data extraction only."""
import re, sys

src = open(sys.argv[1], encoding="utf-8").read()
pairs = re.findall(r'checkOneTerm\(\s*\w+,\s*"((?:[^"\\]|\\.)*)",\s*"((?:[^"\\]|\\.)*)"\s*\)', src)
name = sys.argv[2] if len(sys.argv) > 2 else "GOLDENS"
print(f"{name} = [")
for a, b in pairs:
    print(f'    ("{a}", "{b}"),')
print("]")
print(f"# {len(pairs)} pairs", file=sys.stderr)

# also extract assertAnalyzesTo single-token pairs
pairs2 = re.findall(r'assertAnalyzesTo\(\s*\w+,\s*"((?:[^"\\]|\\.)*)",\s*arrayOf\(\s*"((?:[^"\\]|\\.)*)"\s*\)\s*\)', src)
if pairs2:
    print(f"{name}_A = [")
    for a, b in pairs2:
        print(f'    ("{a}", "{b}"),')
    print("]")
    print(f"# {len(pairs2)} assertAnalyzesTo pairs", file=sys.stderr)
