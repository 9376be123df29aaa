"""ctypes loader + table packer for the compiled Viterbi kernels
(``_native/cmorph.c``).

Two fast paths, both bit-identical to the Python implementations and
both optional (gcc-compiled lazily; transparent fallback):

* ``run_tokenize_ja`` — the whole Japanese ``tokenize()`` (forward +
  search-mode backtrace with prune-and-rescore, ``ja.py:102-326``) in
  one C call that emits token records; Python only builds the
  ``MorphToken`` objects.  Used by ``JapaneseViterbi.tokenize``.
* ``run_forward`` — the shared forward pass (``morph.py:334``) in C,
  with the lattice handed back as arc arrays and materialised into
  ``_Pos`` objects lazily, per position, on first access — the Korean
  backtrace and the Japanese n-best lattice only ever touch the
  positions on paths they walk.  Used by ``ViterbiLattice.forward``.

All packed tables are plain numpy arrays stored on the dictionary
objects, so a Viterbi packed on the driver ships its tables inside the
UDF closure and Spark python workers skip the packing cost.  The
shared object is compiled once per machine into ``_native/`` (atomic
rename, content-hashed name, safe under concurrent workers).  If
anything is missing — no gcc, compile failure, ``LKS_MORPH_NATIVE=0``,
an unregistered subclass (exact-type check, so overriding a hook opts
out automatically), oversized tables — the entry points return
None/False and the caller runs the Python path; results are identical
either way (``tests/test_cmorph_parity.py``).
"""

from __future__ import annotations

import ctypes as ct
import hashlib
import os
import subprocess
import tempfile
import unicodedata

import numpy as np

from .morph import (_Pos, _PUNCT_CATEGORIES, KNOWN, UNKNOWN, USER,
                    MorphEntry, MorphToken)

_DIR = os.path.join(os.path.dirname(__file__), "_native")
_SRC = os.path.join(_DIR, "cmorph.c")

CF_PUNCT, CF_ZS, CF_DIGIT, CF_MN, CF_MCME = 1, 2, 4, 8, 16
_F_LANG_KO, _F_ALWAYS_UNKNOWN, _F_SPACE_PENALTY, _F_LONGEST_USER = 1, 2, 4, 8
_F_SEARCH, _F_EXTENDED, _F_DISCARD_PUNCT, _F_OUT_COMPOUNDS = 16, 32, 64, 128
_TYPES = (KNOWN, UNKNOWN, USER)
_MAX_CP = 0x110000

_LIB = None  # None = not tried, False = unavailable, else CDLL


class _Dict(ct.Structure):
    _fields_ = [("blob", ct.c_void_p), ("t_keyoff", ct.c_void_p),
                ("t_keylen", ct.c_void_p), ("t_idsoff", ct.c_void_p),
                ("t_idslen", ct.c_void_p), ("ids", ct.c_void_p),
                ("lengths", ct.c_void_p), ("n_lengths", ct.c_int32),
                ("cap_mask", ct.c_int64), ("left_id", ct.c_void_p),
                ("right_id", ct.c_void_p), ("word_cost", ct.c_void_p),
                ("space_flag", ct.c_void_p), ("seg_off", ct.c_void_p),
                ("seg_len", ct.c_void_p), ("seg", ct.c_void_p),
                ("ptype", ct.c_void_p), ("m_off", ct.c_void_p),
                ("m_cnt", ct.c_void_p), ("m_lens", ct.c_void_p)]


class _CharDef(ct.Structure):
    _fields_ = [("lo", ct.c_void_p), ("hi", ct.c_void_p),
                ("cls", ct.c_void_p), ("n_ranges", ct.c_int32),
                ("default_cls", ct.c_int16), ("kanji_cls", ct.c_int16),
                ("invoke", ct.c_void_p), ("group", ct.c_void_p),
                ("memo", ct.c_void_p)]


class _ScriptTab(ct.Structure):
    _fields_ = [("lo", ct.c_void_p), ("hi", ct.c_void_p),
                ("id", ct.c_void_p), ("n", ct.c_int32),
                ("memo", ct.c_void_p)]


class _UnkPack(ct.Structure):
    _fields_ = [("off", ct.c_void_p), ("len", ct.c_void_p),
                ("ids", ct.c_void_p), ("left_id", ct.c_void_p),
                ("right_id", ct.c_void_p), ("word_cost", ct.c_void_p),
                ("space_flag", ct.c_void_p), ("ptype", ct.c_void_p),
                ("m_off", ct.c_void_p), ("m_cnt", ct.c_void_p),
                ("m_lens", ct.c_void_p)]


class _Out(ct.Structure):
    _fields_ = [("cost", ct.c_void_p), ("last_right", ct.c_void_p),
                ("back_pos", ct.c_void_p), ("back_word_pos", ct.c_void_p),
                ("back_index", ct.c_void_p), ("back_id", ct.c_void_p),
                ("back_type", ct.c_void_p), ("pos_off", ct.c_void_p),
                ("capacity", ct.c_int64)]


class _TokOut(ct.Structure):
    _fields_ = [("start", ct.c_void_p), ("end", ct.c_void_p),
                ("word_id", ct.c_void_p), ("poslen", ct.c_void_p),
                ("type", ct.c_void_p), ("posinc", ct.c_void_p),
                ("midx", ct.c_void_p), ("capacity", ct.c_int64)]


def _src_bytes() -> bytes:
    """Kernel source — from the filesystem, or (spark-submit --py-files)
    from inside the package zip via importlib.resources."""
    try:
        with open(_SRC, "rb") as f:
            return f.read()
    except OSError:
        from importlib import resources
        return (resources.files("lucene_kmp_spark.analysis")
                / "_native" / "cmorph.c").read_bytes()


def _build_dir() -> str:
    """Writable directory for the compiled .so and the charflags cache.
    The in-repo ``_native/`` dir when available; a per-user temp dir when
    the package is imported from a zip (Spark executors)."""
    if os.path.isdir(_DIR) and os.access(_DIR, os.W_OK):
        return _DIR
    d = os.path.join(tempfile.gettempdir(),
                     f"lks_native_{os.getuid() if hasattr(os, 'getuid') else 0}")
    os.makedirs(d, exist_ok=True)
    return d


def _load():
    """Compile (once per machine) and dlopen the kernel; None if we can't."""
    global _LIB
    if _LIB is not None:
        return _LIB or None
    if os.environ.get("LKS_MORPH_NATIVE", "").lower() in ("0", "false"):
        _LIB = False
        return None
    try:
        src = _src_bytes()
        bdir = _build_dir()
        tag = hashlib.sha256(src).hexdigest()[:12]
        so = os.path.join(bdir, f"cmorph_{tag}.so")
        if not os.path.exists(so):
            fd, csrc = tempfile.mkstemp(suffix=".c", dir=bdir)
            with os.fdopen(fd, "wb") as f:
                f.write(src)
            fd, tmp = tempfile.mkstemp(suffix=".so", dir=bdir)
            os.close(fd)
            try:
                subprocess.run(
                    ["gcc", "-O3", "-fPIC", "-shared", "-o", tmp, csrc],
                    check=True, capture_output=True, timeout=120)
                os.replace(tmp, so)  # atomic: concurrent workers race safely
            finally:
                for leftover in (tmp, csrc):
                    if os.path.exists(leftover):
                        os.unlink(leftover)
        lib = ct.CDLL(so)
        lib.lkm_forward.restype = ct.c_int64
        lib.lkm_forward.argtypes = [
            ct.c_void_p, ct.c_int32, ct.POINTER(_Dict), ct.POINTER(_Dict),
            ct.c_void_p, ct.c_int32, ct.POINTER(_CharDef),
            ct.POINTER(_ScriptTab), ct.c_void_p, ct.POINTER(_UnkPack),
            ct.c_int32, ct.POINTER(_Out)]
        lib.lkm_tokenize_ja.restype = ct.c_int64
        lib.lkm_tokenize_ja.argtypes = [
            ct.c_void_p, ct.c_int32, ct.POINTER(_Dict), ct.POINTER(_Dict),
            ct.c_void_p, ct.c_int32, ct.POINTER(_CharDef), ct.c_void_p,
            ct.POINTER(_UnkPack), ct.c_int32, ct.POINTER(_TokOut)]
        lib.lkm_tokenize_ko.restype = ct.c_int64
        lib.lkm_tokenize_ko.argtypes = [
            ct.c_void_p, ct.c_int32, ct.POINTER(_Dict), ct.POINTER(_Dict),
            ct.c_void_p, ct.c_int32, ct.POINTER(_CharDef),
            ct.POINTER(_ScriptTab), ct.c_void_p, ct.POINTER(_UnkPack),
            ct.c_int32, ct.c_int32, ct.POINTER(_TokOut)]
        _LIB = lib
    except Exception:
        _LIB = False
    return _LIB or None


# --------------------------------------------------------------- flag table
_CHARFLAGS = None


def _char_flags() -> np.ndarray:
    """Per-codepoint classification byte shared by both implementations:
    punctuation (morph.is_punctuation incl. the 0x318D special case), Zs,
    str.isdigit, Mn, Mn|Mc|Me.  Disk-cached per unicodedata version."""
    global _CHARFLAGS
    if _CHARFLAGS is not None:
        return _CHARFLAGS
    cache = os.path.join(
        _build_dir(), f"charflags_u{unicodedata.unidata_version}.npy")
    try:
        t = np.load(cache)
        if t.shape == (_MAX_CP,) and t.dtype == np.uint8:
            _CHARFLAGS = t
            return t
    except Exception:
        pass
    t = np.zeros(_MAX_CP, np.uint8)
    cat = unicodedata.category
    for cp in range(_MAX_CP):
        ch = chr(cp)
        c = cat(ch)
        f = 0
        if c in _PUNCT_CATEGORIES or cp == 0x318D:
            f |= CF_PUNCT
        if c == "Zs":
            f |= CF_ZS
        if ch.isdigit():
            f |= CF_DIGIT
        if c == "Mn":
            f |= CF_MN
        if c in ("Mn", "Mc", "Me"):
            f |= CF_MCME
        t[cp] = f
    try:
        fd, tmp = tempfile.mkstemp(suffix=".npy", dir=_build_dir())
        os.close(fd)
        np.save(tmp, t)  # suffix is .npy, so np.save writes in place
        os.replace(tmp, cache)
    except Exception:
        pass
    _CHARFLAGS = t
    return t


class _MemoArray:
    """Persistent per-codepoint int16 cache the C kernel fills in place.
    Pickles as a fresh empty cache — a 2.2 MB array of -1 is not worth
    shipping inside every task's closure."""

    __slots__ = ("arr",)

    def __init__(self):
        self.arr = np.full(_MAX_CP, -1, np.int16)

    def __reduce__(self):
        return (_MemoArray, ())


# ------------------------------------------------------------------ packers
def _fnv(cps) -> int:
    """FNV-1a 64 over each codepoint's 4 LE bytes — must match fnv1a() in
    cmorph.c exactly."""
    h = 0xCBF29CE484222325
    for v in cps:
        for k in range(4):
            h ^= (v >> (8 * k)) & 0xFF
            h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


_PT = {"MORPHEME": 0, "COMPOUND": 1, "INFLECT": 2, "PREANALYSIS": 3}


def _morph_tables(entries):
    """pos_type byte + decompound morpheme surface lengths per entry."""
    ptype = np.array([_PT.get(e.pos_type, 0) for e in entries], np.uint8)
    m_off, m_cnt, m_lens = [], [], []
    for e in entries:
        m_off.append(len(m_lens))
        m_cnt.append(len(e.morphemes))
        m_lens.extend(len(m[1]) for m in e.morphemes)
    return (ptype, np.array(m_off, np.int32), np.array(m_cnt, np.int32),
            np.array(m_lens, np.int32))


def _space_flags(entries, tags) -> np.ndarray:
    if not tags:
        return np.zeros(len(entries), np.uint8)
    return np.array(
        [1 if e.pos.split("+", 1)[0] in tags else 0 for e in entries],
        np.uint8)


def _pack_prefix_dict(pd, tags, key):
    """Open-addressing table over surfaces; cached on the instance so a
    driver-side pack rides the pickled UDF closure to the workers.
    Returns None when the dictionary exceeds the C kernel's fixed scratch
    (only reachable with >64 distinct surface lengths or >64 user
    segmentation parts — nothing real comes close)."""
    p = getattr(pd, key, None)
    if p is not None:
        return p if p else None
    if len(pd._lengths) > 64 or any(
            len(e.segmentation) > 64 for e in pd.entries):
        setattr(pd, key, False)
        return None
    surfs = list(pd._by_surface.items())
    blob, ids_flat = [], []
    if surfs:
        cap = 1 << max(3, (2 * len(surfs)).bit_length())
        mask = cap - 1
        keyoff = np.full(cap, -1, np.int32)
        keylen = np.zeros(cap, np.int32)
        idsoff = np.zeros(cap, np.int32)
        idslen = np.zeros(cap, np.int32)
        for surface, idlist in surfs:
            cps = [ord(c) for c in surface]
            slot = _fnv(cps) & mask
            while keyoff[slot] >= 0:
                slot = (slot + 1) & mask
            keyoff[slot] = len(blob)
            keylen[slot] = len(cps)
            idsoff[slot] = len(ids_flat)
            idslen[slot] = len(idlist)
            blob.extend(cps)
            ids_flat.extend(idlist)
        cap_mask = mask
    else:
        keyoff = keylen = idsoff = idslen = np.empty(0, np.int32)
        cap_mask = -1
    seg_off, seg_len, seg = [], [], []
    for e in pd.entries:
        seg_off.append(len(seg))
        seg_len.append(len(e.segmentation))
        seg.extend(e.segmentation)
    p = {
        "blob": np.array(blob, np.uint32),
        "t_keyoff": keyoff, "t_keylen": keylen,
        "t_idsoff": idsoff, "t_idslen": idslen,
        "ids": np.array(ids_flat, np.int32),
        "lengths": np.array(pd._lengths, np.int32),
        "cap_mask": cap_mask,
        "left": np.array([e.left_id for e in pd.entries], np.int32),
        "right": np.array([e.right_id for e in pd.entries], np.int32),
        "cost": np.array([e.word_cost for e in pd.entries], np.int32),
        "space": _space_flags(pd.entries, tags),
        "seg_off": np.array(seg_off, np.int32),
        "seg_len": np.array(seg_len, np.int32),
        "seg": np.array(seg, np.int32),
    }
    p["ptype"], p["m_off"], p["m_cnt"], p["m_lens"] = _morph_tables(pd.entries)
    setattr(pd, key, p)
    return p


def _pack_chardef(cd):
    p = getattr(cd, "_cpack", None)
    if p is not None:
        return p if p else None
    names = list(cd.classes.keys())
    idx = {n: i for i, n in enumerate(names)}
    for _, _, name in cd.ranges:
        if name not in idx:
            cd._cpack = False  # inconsistent char_def; Python handles it
            return None
    p = {
        "names": tuple(names),
        "lo": np.array([r[0] for r in cd.ranges], np.int32),
        "hi": np.array([r[1] for r in cd.ranges], np.int32),
        "cls": np.array([idx[r[2]] for r in cd.ranges], np.int16),
        "default": idx[cd.default],
        "kanji": idx.get("KANJI", -1),
        "invoke": np.array([cd.classes[n][0] for n in names], np.uint8),
        "group": np.array([cd.classes[n][1] for n in names], np.uint8),
        "memo": _MemoArray(),
        "charflags": _char_flags(),
    }
    cd._cpack = p
    return p


def _pack_unk(unk, cd_pack, tags, key):
    p = getattr(unk, key, None)
    if p is not None and p["names"] == cd_pack["names"]:
        return p
    flat = []
    per_class = {}
    for cls, entries in unk.by_class.items():  # forward()'s flatten order
        ids = []
        for e in entries:
            ids.append(len(flat))
            flat.append(e)
        per_class[cls] = ids
    off, length, ids_flat = [], [], []
    for name in cd_pack["names"]:
        ids = per_class.get(name, [])
        off.append(len(ids_flat))
        length.append(len(ids))
        ids_flat.extend(ids)
    p = {
        "names": cd_pack["names"],
        "off": np.array(off, np.int32),
        "len": np.array(length, np.int32),
        "ids": np.array(ids_flat, np.int32),
        "left": np.array([e.left_id for e in flat], np.int32),
        "right": np.array([e.right_id for e in flat], np.int32),
        "cost": np.array([e.word_cost for e in flat], np.int32),
        "space": _space_flags(flat, tags),
    }
    p["ptype"], p["m_off"], p["m_cnt"], p["m_lens"] = _morph_tables(flat)
    setattr(unk, key, p)
    return p


def _pack_conn(costs):
    p = getattr(costs, "_cpack", None)
    if p is None:
        p = np.ascontiguousarray(costs.matrix, dtype=np.int32)
        costs._cpack = p
    return p


_SCRIPT_PACK = None


def _pack_scripts():
    global _SCRIPT_PACK
    if _SCRIPT_PACK is None:
        from .ko import _SCRIPT_RANGES
        ids = {"COMMON": 0, "INHERITED": 1}
        for _, _, name in _SCRIPT_RANGES:
            ids.setdefault(name, len(ids))
        _SCRIPT_PACK = {
            "lo": np.array([r[0] for r in _SCRIPT_RANGES], np.int32),
            "hi": np.array([r[1] for r in _SCRIPT_RANGES], np.int32),
            "id": np.array([ids[r[2]] for r in _SCRIPT_RANGES], np.int16),
            "memo": _MemoArray(),
        }
    return _SCRIPT_PACK


# ----------------------------------------------------------- struct builders
_CT_CACHE: dict = {}


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ct.c_void_p) if a.size else None


def _ct_dict(p):
    c = _CT_CACHE.get(id(p))
    if c is None:
        d = _Dict(_ptr(p["blob"]), _ptr(p["t_keyoff"]), _ptr(p["t_keylen"]),
                  _ptr(p["t_idsoff"]), _ptr(p["t_idslen"]), _ptr(p["ids"]),
                  _ptr(p["lengths"]), len(p["lengths"]), p["cap_mask"],
                  _ptr(p["left"]), _ptr(p["right"]), _ptr(p["cost"]),
                  _ptr(p["space"]), _ptr(p["seg_off"]), _ptr(p["seg_len"]),
                  _ptr(p["seg"]), _ptr(p["ptype"]), _ptr(p["m_off"]),
                  _ptr(p["m_cnt"]), _ptr(p["m_lens"]))
        c = (d, p)
        _CT_CACHE[id(p)] = c
    return c[0]


_EMPTY_DICT = _Dict(None, None, None, None, None, None, None, 0, -1,
                    None, None, None, None, None, None, None,
                    None, None, None, None)


def _ct_chardef(p):
    c = _CT_CACHE.get(id(p))
    if c is None:
        d = _CharDef(_ptr(p["lo"]), _ptr(p["hi"]), _ptr(p["cls"]),
                     len(p["lo"]), p["default"], p["kanji"],
                     _ptr(p["invoke"]), _ptr(p["group"]), _ptr(p["memo"].arr))
        c = (d, p)
        _CT_CACHE[id(p)] = c
    return c[0]


def _ct_unk(p):
    c = _CT_CACHE.get(id(p))
    if c is None:
        d = _UnkPack(_ptr(p["off"]), _ptr(p["len"]), _ptr(p["ids"]),
                     _ptr(p["left"]), _ptr(p["right"]), _ptr(p["cost"]),
                     _ptr(p["space"]), _ptr(p["ptype"]), _ptr(p["m_off"]),
                     _ptr(p["m_cnt"]), _ptr(p["m_lens"]))
        c = (d, p)
        _CT_CACHE[id(p)] = c
    return c[0]


def _ct_scripts(p):
    c = _CT_CACHE.get(id(p))
    if c is None:
        d = _ScriptTab(_ptr(p["lo"]), _ptr(p["hi"]), _ptr(p["id"]),
                       len(p["lo"]), _ptr(p["memo"].arr))
        c = (d, p)
        _CT_CACHE[id(p)] = c
    return c[0]


_EMPTY_SCRIPTS = _ScriptTab(None, None, None, 0, None)


def _resolve(v):
    """(lang, space_tags) for the exact registered classes, else None."""
    from .ja import JapaneseViterbi
    from .ko import KoreanViterbi, _SPACE_PENALTY_TAGS
    t = type(v)
    if t is JapaneseViterbi:
        return 0, frozenset()
    if t is KoreanViterbi:
        return 1, _SPACE_PENALTY_TAGS
    return None


def _packs(v, lang, tags):
    """All packed tables for a Viterbi instance, or None to fall back."""
    key = f"_cpack_{lang}"
    kp = _pack_prefix_dict(v.dictionary, tags, key)
    if kp is None:
        return None
    cdp = _pack_chardef(v.char_def)
    if cdp is None:
        return None
    conn = _pack_conn(v.costs)
    if conn.ndim != 2 or conn.shape[1] == 0:
        return None
    up = None
    if v.user is not None:
        up = _pack_prefix_dict(v.user, tags, key)
        if up is None:
            return None
    ukp = _pack_unk(v.unk, cdp, tags, key)
    # context ids must index the packed matrix (Python would IndexError
    # too, but never read out of bounds)
    for pk in filter(None, (kp, up, ukp)):
        if pk["right"].size and int(pk["right"].max()) >= conn.shape[0]:
            return None
        if pk["left"].size and int(pk["left"].max()) >= conn.shape[1]:
            return None
    return kp, up, cdp, conn, ukp


def _base_flags(v, lang):
    flags = 0
    if lang == 1:
        flags |= _F_LANG_KO
    elif getattr(v, "search_mode", False):
        flags |= _F_ALWAYS_UNKNOWN
    if v.enable_space_penalty:
        flags |= _F_SPACE_PENALTY
    if v.output_longest_user_only:
        flags |= _F_LONGEST_USER
    return flags


def prepack(v) -> bool:
    """Best-effort eager packing at tokenizer-construction time (driver
    side), so the packed tables ride the pickled UDF closure and Spark
    python workers skip the packing cost entirely."""
    try:
        lang_tags = _resolve(v)
        if lang_tags is None:
            return False
        lang, tags = lang_tags
        if lang == 1:
            _pack_scripts()
        return _packs(v, lang, tags) is not None
    except Exception:
        return False


# ----------------------------------------------------------- lazy positions
class _LazyPositions(dict):
    """positions dict materialising ``_Pos`` objects from the kernel's arc
    arrays on first access — backtraces only touch the path they walk."""

    __slots__ = ("_off", "_arrs", "_n")

    def __init__(self, off, arrs, n):
        super().__init__()
        self._off = off
        self._arrs = arrs
        self._n = n

    def _materialize(self, k):
        if not (0 <= k <= self._n):
            return None
        s, e = int(self._off[k]), int(self._off[k + 1])
        if s == e:
            return None
        cost, lr, bp, bwp, bi, bid, bt = self._arrs
        P = _Pos(k)
        P.costs = cost[s:e].tolist()
        P.last_right = lr[s:e].tolist()
        P.back_pos = bp[s:e].tolist()
        P.back_word_pos = bwp[s:e].tolist()
        P.back_index = bi[s:e].tolist()
        P.back_id = bid[s:e].tolist()
        P.back_type = [_TYPES[t] for t in bt[s:e].tolist()]
        dict.__setitem__(self, k, P)
        return P

    def __missing__(self, k):
        P = self._materialize(k)
        if P is None:
            raise KeyError(k)
        return P

    def get(self, k, default=None):
        v = dict.get(self, k, _LazyPositions)
        if v is not _LazyPositions:
            return v
        P = self._materialize(k)
        return P if P is not None else default

    def __contains__(self, k):
        return dict.__contains__(self, k) or self._materialize(k) is not None


# ------------------------------------------------------------------ runtime
def run_forward(v, text: str) -> bool:
    """Run the native forward pass for ``v`` and install a lazily
    materialised ``v.positions``.  False -> caller runs the Python path."""
    lib = _load()
    if lib is None:
        return False
    lang_tags = _resolve(v)
    if lang_tags is None:
        return False
    lang, tags = lang_tags
    try:
        buf = text.encode("utf-32-le")
    except UnicodeEncodeError:
        return False  # lone surrogates: let Python handle them
    packs = _packs(v, lang, tags)
    if packs is None:
        return False
    kp, up, cdp, conn, ukp = packs
    st = _ct_scripts(_pack_scripts()) if lang == 1 else _EMPTY_SCRIPTS
    flags = _base_flags(v, lang)

    n = len(text)
    tarr = np.frombuffer(buf, np.uint32)
    cap = 24 * n + 128
    while True:
        o_cost = np.empty(cap, np.int64)
        o_lr = np.empty(cap, np.int32)
        o_bp = np.empty(cap, np.int32)
        o_bwp = np.empty(cap, np.int32)
        o_bi = np.empty(cap, np.int32)
        o_bid = np.empty(cap, np.int32)
        o_bt = np.empty(cap, np.int8)
        o_off = np.empty(n + 2, np.int32)
        out = _Out(_ptr(o_cost), _ptr(o_lr), _ptr(o_bp), _ptr(o_bwp),
                   _ptr(o_bi), _ptr(o_bid), _ptr(o_bt), _ptr(o_off), cap)
        rc = lib.lkm_forward(
            tarr.ctypes.data_as(ct.c_void_p), n, ct.byref(_ct_dict(kp)),
            ct.byref(_ct_dict(up) if up is not None else _EMPTY_DICT),
            conn.ctypes.data_as(ct.c_void_p), conn.shape[1],
            ct.byref(_ct_chardef(cdp)), ct.byref(st),
            cdp["charflags"].ctypes.data_as(ct.c_void_p),
            ct.byref(_ct_unk(ukp)), flags, ct.byref(out))
        if rc == -2:
            cap *= 2
            continue
        if rc < 0:
            return False
        break
    v.positions = _LazyPositions(
        o_off, (o_cost, o_lr, o_bp, o_bwp, o_bi, o_bid, o_bt), n)
    return True


def run_tokenize_ja(v, text: str):
    """Full Japanese tokenize in C; returns the token list, or None to
    fall back to the Python path."""
    lib = _load()
    if lib is None:
        return None
    from .ja import JapaneseViterbi
    if type(v) is not JapaneseViterbi:
        return None
    try:
        buf = text.encode("utf-32-le")
    except UnicodeEncodeError:
        return None
    packs = _packs(v, 0, frozenset())
    if packs is None:
        return None
    kp, up, cdp, conn, ukp = packs
    flags = _base_flags(v, 0)
    if v.search_mode:
        flags |= _F_SEARCH
    if v.extended_mode:
        flags |= _F_EXTENDED
    if v.discard_punctuation:
        flags |= _F_DISCARD_PUNCT
    if v.output_compounds:
        flags |= _F_OUT_COMPOUNDS

    n = len(text)
    tarr = np.frombuffer(buf, np.uint32)
    cap = 4 * n + 64
    while True:
        t_s = np.empty(cap, np.int32)
        t_e = np.empty(cap, np.int32)
        t_id = np.empty(cap, np.int32)
        t_pl = np.empty(cap, np.int32)
        t_ty = np.empty(cap, np.int8)
        t_pi = np.empty(cap, np.int8)
        t_mi = np.empty(cap, np.int32)
        out = _TokOut(_ptr(t_s), _ptr(t_e), _ptr(t_id), _ptr(t_pl),
                      _ptr(t_ty), _ptr(t_pi), _ptr(t_mi), cap)
        rc = lib.lkm_tokenize_ja(
            tarr.ctypes.data_as(ct.c_void_p), n, ct.byref(_ct_dict(kp)),
            ct.byref(_ct_dict(up) if up is not None else _EMPTY_DICT),
            conn.ctypes.data_as(ct.c_void_p), conn.shape[1],
            ct.byref(_ct_chardef(cdp)),
            cdp["charflags"].ctypes.data_as(ct.c_void_p),
            ct.byref(_ct_unk(ukp)), flags, ct.byref(out))
        if rc == -2:
            cap *= 2
            continue
        if rc < 0:
            return None
        break

    cnt = int(rc)
    v._flatten_unknowns()
    v.text = text
    v.positions = {}  # lattice consumed in C; tokenize() owns the state
    ent_known = v.dictionary.entries
    ent_user = v.user.entries if v.user is not None else None
    ent_unk = v._unk_entries
    starts = t_s[:cnt].tolist()
    ends = t_e[:cnt].tolist()
    wids = t_id[:cnt].tolist()
    plens = t_pl[:cnt].tolist()
    types = t_ty[:cnt].tolist()
    toks = []
    for i in range(cnt - 1, -1, -1):  # pending is emitted reversed
        t = types[i]
        wid = wids[i]
        if t == 0:
            e, ty = ent_known[wid], KNOWN
        elif t == 1:
            e, ty = ent_unk[wid], UNKNOWN
        else:
            e, ty = ent_user[wid], USER
        tok = MorphToken(text[starts[i]:ends[i]], starts[i], ends[i], ty, e)
        if plens[i] != 1:
            tok.position_length = plens[i]
        toks.append(tok)
    return toks


def run_tokenize_ko(v, text: str):
    """Full Korean tokenize in C; returns the token list, or None to
    fall back to the Python path."""
    lib = _load()
    if lib is None:
        return None
    from .ko import DISCARD, MIXED, NONE, KoreanViterbi, _SPACE_PENALTY_TAGS
    if type(v) is not KoreanViterbi:
        return None
    mode = {NONE: 0, DISCARD: 1, MIXED: 2}.get(v.mode)
    if mode is None:
        return None
    try:
        buf = text.encode("utf-32-le")
    except UnicodeEncodeError:
        return None
    packs = _packs(v, 1, _SPACE_PENALTY_TAGS)
    if packs is None:
        return None
    kp, up, cdp, conn, ukp = packs
    st = _ct_scripts(_pack_scripts())
    flags = _base_flags(v, 1)
    if v.discard_punctuation:
        flags |= _F_DISCARD_PUNCT
    if v.output_unknown_unigrams:
        flags |= _F_EXTENDED  # reused bit: output_unknown_unigrams

    n = len(text)
    tarr = np.frombuffer(buf, np.uint32)
    cap = 4 * n + 64
    while True:
        t_s = np.empty(cap, np.int32)
        t_e = np.empty(cap, np.int32)
        t_id = np.empty(cap, np.int32)
        t_pl = np.empty(cap, np.int32)
        t_ty = np.empty(cap, np.int8)
        t_pi = np.empty(cap, np.int8)
        t_mi = np.empty(cap, np.int32)
        out = _TokOut(_ptr(t_s), _ptr(t_e), _ptr(t_id), _ptr(t_pl),
                      _ptr(t_ty), _ptr(t_pi), _ptr(t_mi), cap)
        rc = lib.lkm_tokenize_ko(
            tarr.ctypes.data_as(ct.c_void_p), n, ct.byref(_ct_dict(kp)),
            ct.byref(_ct_dict(up) if up is not None else _EMPTY_DICT),
            conn.ctypes.data_as(ct.c_void_p), conn.shape[1],
            ct.byref(_ct_chardef(cdp)), ct.byref(st),
            cdp["charflags"].ctypes.data_as(ct.c_void_p),
            ct.byref(_ct_unk(ukp)), flags, mode, ct.byref(out))
        if rc == -2:
            cap *= 2
            continue
        if rc < 0:
            return None
        break

    cnt = int(rc)
    v._flatten_unknowns()
    v.text = text
    v.positions = {}  # lattice consumed in C; tokenize() owns the state
    ent_known = v.dictionary.entries
    ent_user = v.user.entries if v.user is not None else None
    ent_unk = v._unk_entries
    space_entry = None
    starts = t_s[:cnt].tolist()
    ends = t_e[:cnt].tolist()
    wids = t_id[:cnt].tolist()
    plens = t_pl[:cnt].tolist()
    types = t_ty[:cnt].tolist()
    pincs = t_pi[:cnt].tolist()
    midxs = t_mi[:cnt].tolist()
    toks = []
    for i in range(cnt - 1, -1, -1):  # pending is emitted reversed
        t = types[i]
        if t == 3:  # whitespace run (ko.py:282-288)
            if space_entry is None:
                space_entry = (v.unk.entries_for("SPACE") or
                               [MorphEntry(" ", 0, 0, 0, "SP")])[0]
            tok = MorphToken(text[starts[i]:ends[i]], starts[i], ends[i],
                             UNKNOWN, space_entry)
        else:
            wid = wids[i]
            if t == 0:
                e0, ty = ent_known[wid], KNOWN
            elif t == 1:
                e0, ty = ent_unk[wid], UNKNOWN
            else:
                e0, ty = ent_user[wid], USER
            mi = midxs[i]
            if mi >= 0:  # decompound part (ko.py:258-276)
                m_pos, m_surface = e0.morphemes[mi]
                tok = MorphToken(
                    m_surface, starts[i], ends[i], ty,
                    MorphEntry(m_surface, e0.left_id, e0.right_id, 0, m_pos))
            else:
                tok = MorphToken(text[starts[i]:ends[i]], starts[i],
                                 ends[i], ty, e0)
        if plens[i] != 1:
            tok.position_length = plens[i]
        if pincs[i] != 1:
            tok.position_increment = pincs[i]
        toks.append(tok)
    return toks
