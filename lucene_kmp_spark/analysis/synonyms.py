"""Multi-word synonym expansion + Solr rule parsing
(``analysis/common/.../analysis/synonym/`` — SynonymMap.kt,
SynonymGraphFilter.kt, SolrSynonymParser.kt).

``synonym_graph_analyzer`` performs SynonymMap-style greedy longest
matching over consecutive tokens and emits the match's replacement
sequences alongside (or instead of) the original tokens, at flattened
index positions: the k-th replacement token lands on the position of the
min(k, n-1)-th matched original token — exactly what Lucene's
SynonymGraphFilter + FlattenGraphFilter pair stores in the index (the
well-known "sausage" flattening; query-time graph semantics are a search
concern the reference also only honors at query parse time).

``parse_solr_synonyms`` handles the Solr list format: ``a, b => c, d``
explicit mappings and ``a, b, c`` equivalence classes (expand=True maps
every member to every member; expand=False maps every member to the
first).
"""
from __future__ import annotations

from lucene_kmp_spark.analysis.standard import analyze


def parse_solr_synonyms(rules: str, expand: bool = True,
                        analyzer=None) -> dict[tuple[str, ...], list[tuple[str, ...]]]:
    """SolrSynonymParser.kt: one rule per line, '#' comments, ','-separated
    multi-word phrases, '=>' for explicit mappings. Phrases are analyzed
    (default: the standard chain) so rules match indexed terms."""
    if analyzer is None:
        def analyzer(s):
            return analyze(s)

    def phrase(s: str) -> tuple[str, ...]:
        return tuple(analyzer(s.strip())[0])

    out: dict[tuple[str, ...], list[tuple[str, ...]]] = {}

    def add(src: tuple[str, ...], dst: tuple[str, ...]):
        if src and dst and src != dst:
            lst = out.setdefault(src, [])
            if dst not in lst:
                lst.append(dst)

    for raw in rules.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if "=>" in line:
            lhs, rhs = line.split("=>", 1)
            sources = [phrase(p) for p in lhs.split(",")]
            targets = [phrase(p) for p in rhs.split(",")]
            for s in sources:
                for t in targets:
                    add(s, t)
        else:
            members = [phrase(p) for p in line.split(",")]
            if expand:
                for s in members:
                    for t in members:
                        add(s, t)
            else:
                for s in members[1:]:
                    add(s, members[0])
    return out


def synonym_graph_analyzer(synonym_map: dict[tuple[str, ...], list[tuple[str, ...]]],
                           keep_orig: bool = True,
                           stop_words: tuple[str, ...] = (),
                           base_analyzer=None):
    """Greedy longest-match multi-word synonym expansion at index time.

    ``synonym_map``: token-sequence -> replacement token-sequences (use
    :func:`parse_solr_synonyms`, or build directly). Matching is over
    consecutive tokens (stopword holes do not interrupt adjacency checks —
    the reference's SynonymMap matches the post-filter stream the same
    way). Overlapping matches resolve to the longest, then leftmost,
    like SynonymGraphFilter's parser."""
    if not synonym_map:
        raise ValueError("synonym_map must not be empty")
    max_len = max(len(k) for k in synonym_map)
    stop = frozenset(stop_words) if stop_words else None

    def run(text: str):
        if base_analyzer is not None:
            terms, positions, length = base_analyzer(text)
        else:
            terms, positions, length = analyze(text, stop_set=stop)
        out_t: list[str] = []
        out_p: list[int] = []
        i, n = 0, len(terms)
        while i < n:
            match_len = 0
            match_dsts = None
            for l in range(min(max_len, n - i), 0, -1):
                dsts = synonym_map.get(tuple(terms[i:i + l]))
                if dsts:
                    match_len = l
                    match_dsts = dsts
                    break
            if match_len == 0:
                out_t.append(terms[i])
                out_p.append(positions[i])
                i += 1
                continue
            span_pos = positions[i:i + match_len]
            if keep_orig:
                out_t.extend(terms[i:i + match_len])
                out_p.extend(span_pos)
            for dst in match_dsts:
                for k, tok in enumerate(dst):
                    out_t.append(tok)
                    out_p.append(span_pos[min(k, match_len - 1)])
            i += match_len
        return out_t, out_p, length

    return run
