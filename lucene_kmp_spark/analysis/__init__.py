from lucene_kmp_spark.analysis.standard import (  # noqa: F401
    Token,
    analyze,
    analyze_offsets,
    standard_tokenize,
)
from lucene_kmp_spark.analysis.en import (  # noqa: F401
    ENGLISH_STOP_WORDS,
    english_analyzer,
    english_minimal_stem,
    english_possessive,
    porter_stem,
)
