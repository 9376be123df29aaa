from lucene_kmp_spark.analysis.standard import (  # noqa: F401
    Token,
    analyze,
    analyze_offsets,
    standard_tokenize,
)
