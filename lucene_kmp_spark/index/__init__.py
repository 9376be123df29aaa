from lucene_kmp_spark.index.builder import InvertedIndex, build_index  # noqa: F401
from lucene_kmp_spark.index.docids import assign_doc_ids, assign_doc_ids_sorted  # noqa: F401
from lucene_kmp_spark.index.livevalues import LiveFieldValues  # noqa: F401
from lucene_kmp_spark.index.multireader import multi_reader  # noqa: F401
from lucene_kmp_spark.index.segments import (  # noqa: F401
    CommitFailError,
    PrepareCommitFailError,
    SegmentedIndexWriter,
    execute_two_phase,
)
