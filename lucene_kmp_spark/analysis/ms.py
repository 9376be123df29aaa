"""Malay analysis chain (``analysis/extra/.../analysis/ms/``).

* ``malay_normalize`` — ``ms/MalayNormalizer.kt``: quote/dash unification
  and Latin diacritic folds.
* ``malay_stem`` — ``ms/MalayStemmer.kt``: the Tala-style light stemmer
  for the shared meN-/peN-/ber-/di-/ter-/ke- + -kan/-an/-i affix family,
  with syllable-count guards and prefix/suffix interplay flags (the same
  shape as the Indonesian stemmer).
* ``malay_analyzer`` — ``ms/MalayAnalyzer.kt`` chain: StandardTokenizer ->
  LowerCase -> DecimalDigit -> [keyword] -> MalayNormalization -> Stop ->
  MalayStem.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

MALAY_STOP_WORDS = frozenset((
    "#", "abdul", "abdullah", "acara", "ada", "adalah", "ahmad", "air",
    "akan", "akhbar", "akhir", "aktiviti", "alam", "amat", "amerika",
    "anak", "anggota", "antara", "antarabangsa", "apa", "apabila", "april",
    "as", "asas", "asean", "asia", "asing", "atas", "atau", "australia",
    "awal", "awam", "bagaimanapun", "bagi", "bahagian", "bahan", "baharu",
    "bahawa", "baik", "bandar", "bank", "banyak", "barangan", "baru",
    "baru-baru", "bawah", "beberapa", "bekas", "beliau", "belum", "berada",
    "berakhir", "berbanding", "berdasarkan", "berharap", "berikutan",
    "berjaya", "berjumlah", "berkaitan", "berkata", "berkenaan", "berlaku",
    "bermula", "bernama", "bernilai", "bersama", "berubah", "besar", "bhd",
    "bidang", "bilion", "bn", "boleh", "bukan", "bulan", "bursa",
    "cadangan", "china", "dagangan", "dalam", "dan", "dana", "dapat",
    "dari", "daripada", "dasar", "datang", "datuk", "demikian", "dengan",
    "depan", "derivatives", "dewan", "di", "diadakan", "dibuka",
    "dicatatkan", "dijangka", "diniagakan", "dis", "disember", "ditutup",
    "dolar", "dr", "dua", "dunia", "ekonomi", "eksekutif", "eksport",
    "empat", "enam", "faedah", "feb", "global", "hadapan", "hanya",
    "harga", "hari", "hasil", "hingga", "hubungan", "ia", "iaitu", "ialah",
    "indeks", "india", "indonesia", "industri", "ini", "islam", "isnin",
    "isu", "itu", "jabatan", "jalan", "jan", "jawatan", "jawatankuasa",
    "jepun", "jika", "jualan", "juga", "julai", "jumaat", "jumlah", "jun",
    "juta", "kadar", "kalangan", "kali", "kami", "kata", "katanya",
    "kaunter", "kawasan", "ke", "keadaan", "kecil", "kedua", "kedua-dua",
    "kedudukan", "kekal", "kementerian", "kemudahan", "kenaikan",
    "kenyataan", "kepada", "kepentingan", "keputusan", "kerajaan",
    "kerana", "kereta", "kerja", "kerjasama", "kes", "keselamatan",
    "keseluruhan", "kesihatan", "ketika", "ketua", "keuntungan",
    "kewangan", "khamis", "kini", "kira-kira", "kita", "klci", "klibor",
    "komposit", "kontrak", "kos", "kuala", "kuasa", "kukuh", "kumpulan",
    "lagi", "lain", "langkah", "laporan", "lebih", "lepas", "lima", "lot",
    "luar", "lumpur", "mac", "mahkamah", "mahu", "majlis", "makanan",
    "maklumat", "malam", "malaysia", "mana", "manakala", "masa", "masalah",
    "masih", "masing-masing", "masyarakat", "mata", "media", "mei",
    "melalui", "melihat", "memandangkan", "memastikan", "membantu",
    "membawa", "memberi", "memberikan", "membolehkan", "membuat",
    "mempunyai", "menambah", "menarik", "menawarkan", "mencapai",
    "mencatatkan", "mendapat", "mendapatkan", "menerima", "menerusi",
    "mengadakan", "mengambil", "mengenai", "menggalakkan", "menggunakan",
    "mengikut", "mengumumkan", "mengurangkan", "meningkat", "meningkatkan",
    "menjadi", "menjelang", "menokok", "menteri", "menunjukkan", "menurut",
    "menyaksikan", "menyediakan", "mereka", "merosot", "merupakan",
    "mesyuarat", "minat", "minggu", "minyak", "modal", "mohd", "mudah",
    "mungkin", "naik", "najib", "nasional", "negara", "negara-negara",
    "negeri", "niaga", "nilai", "nov", "ogos", "okt", "oleh", "operasi",
    "orang", "pada", "pagi", "paling", "pameran", "papan", "para", "paras",
    "parlimen", "parti", "pasaran", "pasukan", "pegawai", "pejabat",
    "pekerja", "pelabur", "pelaburan", "pelancongan", "pelanggan",
    "pelbagai", "peluang", "pembangunan", "pemberita", "pembinaan",
    "pemimpin", "pendapatan", "pendidikan", "penduduk", "penerbangan",
    "pengarah", "pengeluaran", "pengerusi", "pengguna", "pengurusan",
    "peniaga", "peningkatan", "penting", "peratus", "perdagangan",
    "perdana", "peringkat", "perjanjian", "perkara", "perkhidmatan",
    "perladangan", "perlu", "permintaan", "perniagaan", "persekutuan",
    "persidangan", "pertama", "pertubuhan", "pertumbuhan", "perusahaan",
    "peserta", "petang", "pihak", "pilihan", "pinjaman", "polis",
    "politik", "presiden", "prestasi", "produk", "program", "projek",
    "proses", "proton", "pukul", "pula", "pusat", "rabu", "rakan",
    "rakyat", "ramai", "rantau", "raya", "rendah", "ringgit", "rumah",
    "sabah", "sahaja", "saham", "sama", "sarawak", "satu", "sawit", "saya",
    "sdn", "sebagai", "sebahagian", "sebanyak", "sebarang", "sebelum",
    "sebelumnya", "sebuah", "secara", "sedang", "segi", "sehingga",
    "sejak", "sekarang", "sektor", "sekuriti", "selain", "selama",
    "selasa", "selatan", "selepas", "seluruh", "semakin", "semalam",
    "semasa", "sementara", "semua", "semula", "sen", "sendiri", "seorang",
    "sepanjang", "seperti", "sept", "september", "serantau", "seri",
    "serta", "sesi", "setiap", "setiausaha", "sidang", "singapura", "sini",
    "sistem", "sokongan", "sri", "sudah", "sukan", "suku", "sumber",
    "supaya", "susut", "syarikat", "syed", "tahap", "tahun", "tan",
    "tanah", "tanpa", "tawaran", "teknologi", "telah", "tempat",
    "tempatan", "tempoh", "tenaga", "tengah", "tentang", "terbaik",
    "terbang", "terbesar", "terbuka", "terdapat", "terhadap", "termasuk",
    "tersebut", "terus", "tetapi", "thailand", "tiada", "tidak", "tiga",
    "timbalan", "timur", "tindakan", "tinggi", "tun", "tunai", "turun",
    "turut", "umno", "unit", "untuk", "untung", "urus", "usaha", "utama",
    "walaupun", "wang", "wanita", "wilayah", "yang",
))


_MS_FOLD = str.maketrans({
    "\u2019": "'", "\u2018": "'", "\u201b": "'", "\u02b9": "'",
    "\u02bc": "'", "`": "'", "\u00b4": "'",
    "\u2010": "-", "\u2011": "-", "\u2012": "-", "\u2013": "-",
    "\u2014": "-", "\u2015": "-",
    "\u00e0": "a", "\u00e1": "a", "\u00e2": "a", "\u00e3": "a",
    "\u00e4": "a", "\u00e5": "a", "\u0101": "a", "\u0103": "a",
    "\u0105": "a",
    "\u00e8": "e", "\u00e9": "e", "\u00ea": "e", "\u00eb": "e",
    "\u0113": "e", "\u0115": "e", "\u0117": "e", "\u0119": "e",
    "\u011b": "e",
    "\u00ec": "i", "\u00ed": "i", "\u00ee": "i", "\u00ef": "i",
    "\u0129": "i", "\u012b": "i", "\u012d": "i", "\u012f": "i",
    "\u00f2": "o", "\u00f3": "o", "\u00f4": "o", "\u00f5": "o",
    "\u00f6": "o", "\u014d": "o", "\u014f": "o", "\u0151": "o",
    "\u00f9": "u", "\u00fa": "u", "\u00fb": "u", "\u00fc": "u",
    "\u0169": "u", "\u016b": "u", "\u016d": "u", "\u016f": "u",
    "\u0171": "u", "\u0173": "u",
    "\u00e7": "c", "\u0107": "c", "\u0109": "c", "\u010b": "c",
    "\u010d": "c",
    "\u00f1": "n", "\u0144": "n", "\u0146": "n", "\u0148": "n",
})
_MS_VOWELS = frozenset("aeiou")

_REMOVED_KE = 1
_REMOVED_PENG = 2
_REMOVED_DI = 4
_REMOVED_MENG = 8
_REMOVED_TER = 16
_REMOVED_BER = 32
_REMOVED_PE = 64


def malay_normalize(term: str) -> str:
    return term.translate(_MS_FOLD)


class _MsState:
    __slots__ = ("syllables", "flags")


def _ms_first_order_prefix(w: str, st: _MsState) -> str:
    V = _MS_VOWELS
    if w.startswith("meng"):
        st.flags |= _REMOVED_MENG; st.syllables -= 1; return w[4:]
    if w.startswith("meny") and len(w) > 4 and w[4] in V:
        st.flags |= _REMOVED_MENG; st.syllables -= 1; return "s" + w[4:]
    if w.startswith("men") and len(w) > 3 and w[3] in V:
        st.flags |= _REMOVED_MENG; st.syllables -= 1; return "t" + w[3:]
    if w.startswith("men"):
        st.flags |= _REMOVED_MENG; st.syllables -= 1; return w[3:]
    if w.startswith("mem") and len(w) > 3 and w[3] in V:
        st.flags |= _REMOVED_MENG; st.syllables -= 1; return "p" + w[3:]
    if w.startswith("mem"):
        st.flags |= _REMOVED_MENG; st.syllables -= 1; return w[3:]
    if w.startswith("me"):
        st.flags |= _REMOVED_MENG; st.syllables -= 1; return w[2:]
    if w.startswith("peng"):
        st.flags |= _REMOVED_PENG; st.syllables -= 1; return w[4:]
    if w.startswith("peny") and len(w) > 4 and w[4] in V:
        st.flags |= _REMOVED_PENG; st.syllables -= 1; return "s" + w[4:]
    if w.startswith("peny"):
        st.flags |= _REMOVED_PENG; st.syllables -= 1; return w[4:]
    if w.startswith("pen") and len(w) > 3 and w[3] in V:
        st.flags |= _REMOVED_PENG; st.syllables -= 1; return "t" + w[3:]
    if w.startswith("pen"):
        st.flags |= _REMOVED_PENG; st.syllables -= 1; return w[3:]
    if w.startswith("pem") and len(w) > 3 and w[3] in V:
        st.flags |= _REMOVED_PENG; st.syllables -= 1; return "p" + w[3:]
    if w.startswith("pem"):
        st.flags |= _REMOVED_PENG; st.syllables -= 1; return w[3:]
    if w.startswith("di"):
        st.flags |= _REMOVED_DI; st.syllables -= 1; return w[2:]
    if w.startswith("ter"):
        st.flags |= _REMOVED_TER; st.syllables -= 1; return w[3:]
    if w.startswith("ke"):
        st.flags |= _REMOVED_KE; st.syllables -= 1; return w[2:]
    return w


def _ms_second_order_prefix(w: str, st: _MsState) -> str:
    if w.startswith("ber") or w == "belajar":
        st.flags |= _REMOVED_BER; st.syllables -= 1; return w[3:]
    if len(w) > 4 and w.startswith("be") and w[2] not in _MS_VOWELS \
            and w[3] == "e" and w[4] == "r":
        st.flags |= _REMOVED_BER; st.syllables -= 1; return w[2:]
    if w.startswith("per") or w == "pelajar":
        st.syllables -= 1; return w[3:]
    if w.startswith("pe"):
        st.flags |= _REMOVED_PE; st.syllables -= 1; return w[2:]
    return w


def _ms_suffix(w: str, st: _MsState) -> str:
    f = st.flags
    if w.endswith("kan") and not f & (_REMOVED_KE | _REMOVED_PENG
                                      | _REMOVED_PE):
        st.syllables -= 1; return w[:-3]
    if w.endswith("an") and not f & (_REMOVED_DI | _REMOVED_MENG
                                     | _REMOVED_TER):
        st.syllables -= 1; return w[:-2]
    if w.endswith("i") and not w.endswith("si") \
            and not f & (_REMOVED_BER | _REMOVED_KE | _REMOVED_PENG):
        st.syllables -= 1; return w[:-1]
    return w


def malay_stem(word: str) -> str:
    """MalayStemmer.stem (ms/MalayStemmer.kt:20-59)."""
    if len(word) <= 3 or word != word.lower():
        return word
    st = _MsState()
    st.flags = 0
    st.syllables = sum(1 for c in word if c in _MS_VOWELS)
    w = word
    if st.syllables > 2:
        if w.endswith(("kah", "lah", "pun")):
            st.syllables -= 1
            w = w[:-3]
    if st.syllables > 2:
        if w.endswith(("ku", "mu")):
            st.syllables -= 1
            w = w[:-2]
        elif w.endswith("nya"):
            st.syllables -= 1
            w = w[:-3]
    if st.syllables > 2:
        old = w
        if st.syllables > 2:
            w = _ms_first_order_prefix(w, st)
        if old != w:
            old = w
            if st.syllables > 2:
                w = _ms_suffix(w, st)
            if old != w and st.syllables > 2:
                w = _ms_second_order_prefix(w, st)
        else:
            if st.syllables > 2:
                w = _ms_second_order_prefix(w, st)
            if st.syllables > 2:
                w = _ms_suffix(w, st)
    return w


def malay_analyzer(stop_words=None, stem_exclusions=(),
                   max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    stop = MALAY_STOP_WORDS if stop_words is None else frozenset(stop_words)
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = decimal_digit_fold(_lower_simple(t.term))
            is_keyword = term in excl
            if not is_keyword:
                term = malay_normalize(term)
            if term in stop:
                continue
            if not is_keyword:
                term = malay_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
