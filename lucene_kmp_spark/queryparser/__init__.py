from lucene_kmp_spark.queryparser.parser import QueryParser, parse  # noqa: F401
