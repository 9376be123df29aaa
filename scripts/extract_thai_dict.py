"""One-off: decode the JDK's thai_dict trie (sun.text.BreakDictionary
format, GPLv2+CE data distributed with every JDK) into a plain word list.
Format per BreakDictionary: big-endian ints/shorts — version, length,
column map (short index + byte values), numCols, numColGroups, rowIndex,
rowIndexFlagsIndex, rowIndexFlags, rowIndexShifts, state table,
supplementary map. Root state is 0; transition to -1 at column 0 marks an
accepted word."""
import struct, sys

data = open(sys.argv[1], 'rb').read()
pos = 0
def i32():
    global pos
    v = struct.unpack_from('>i', data, pos)[0]; pos += 4; return v
def i16s(n):
    global pos
    v = struct.unpack_from('>%dh' % n, data, pos); pos += 2*n; return v
def u8s(n):
    global pos
    v = data[pos:pos+n]; pos += n; return v

version = i32(); assert version == 1, version
total = i32(); assert pos + total == len(data), (pos, total, len(data))
n = i32(); col_map_index = i16s(n)
n = i32(); col_map_values = u8s(n)
block = 65536 // len(col_map_index)
num_cols = i32(); num_col_groups = i32()
n = i32(); row_index = i16s(n)
n = i32(); rif_index = i16s(n)
n = i32(); rif = struct.unpack_from('>%di' % n, data, pos); pos += 4*n
n = i32(); row_shifts = struct.unpack_from('>%db' % n, data, pos); pos += n
n = i32(); table = i16s(n)
n = i32(); pos += 4*n  # supplementary (unused for thai)
assert pos == len(data)

def col_of(ch):
    base = col_map_index[ch // block] & 0xffff
    return col_map_values[base + (ch % block)]

def next_state(row, col):
    fi = rif_index[row]
    if fi < 0:
        if col != -fi:
            return 0
    else:
        if not (rif[fi + (col >> 5)] & (1 << (col & 0x1f))):
            return 0
    return table[(row_index[row] & 0xffff) * num_cols + col + row_shifts[row]]

# char -> col for all BMP chars with a non-zero column
char_cols = {}
for ch in range(0x10000):
    c = col_of(ch)
    if c:
        char_cols.setdefault(c, []).append(ch)

words = []
def dfs(state, path):
    if next_state(state, 0) == -1:
        words.append(''.join(path))
    for col, chars in char_cols.items():
        for ch in chars:
            nxt = next_state(state, col)
            if nxt > 0:
                path.append(chr(ch)); dfs(nxt, path); path.pop()
            elif nxt == -1 and path:
                pass  # end marker handled via col 0

sys.setrecursionlimit(100000)
dfs(0, [])
print(len(words), 'words', file=sys.stderr)
for w in sorted(words):
    print(w)
