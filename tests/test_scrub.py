"""PII scrubbing + paragraph dedup ops."""

import pytest

from lucene_kmp_spark.pipeline.scrub import (
    paragraph_dedup,
    pii_counts,
    remove_repeated_paragraphs,
    scrub_pii,
)


@pytest.fixture(scope="module")
def pii_df(spark):
    return spark.createDataFrame(
        [
            (0, "contact me at jane.doe+x@example.co.uk or +1 555 0100 999"),
            (1, "server 192.168.1.200 ssn 123-45-6789 card 4111 1111 1111 1111"),
            (2, "nothing sensitive here"),
        ],
        schema="doc_id long, text string",
    )


def test_scrub_pii(pii_df):
    rows = {r.doc_id: r.text for r in scrub_pii(pii_df).collect()}
    assert rows[0] == "contact me at [PII] or [PII]"
    assert rows[1] == "server [PII] ssn [PII] card [PII]"
    assert rows[2] == "nothing sensitive here"


def test_scrub_kinds_subset(pii_df):
    rows = {r.doc_id: r.text for r in scrub_pii(pii_df, kinds=("email",)).collect()}
    assert rows[0].startswith("contact me at [PII] or +1 555")
    assert "192.168.1.200" in rows[1]


def test_pii_counts(pii_df):
    rows = {r.doc_id: r for r in pii_counts(pii_df).collect()}
    assert rows[0].n_email == 1 and rows[0].n_phone == 1 and rows[0].n_ipv4 == 0
    assert rows[1].n_ipv4 == 1 and rows[1].n_ssn == 1 and rows[1].n_cc == 1
    assert all(rows[2][f"n_{k}"] == 0 for k in ("email", "ipv4", "ssn", "cc", "phone"))


def test_remove_repeated_paragraphs(spark):
    df = spark.createDataFrame(
        [(0, "aa bb\n\ncc dd\n\naa bb\n\nee"), (1, "xx\n\nxx\n\nxx")],
        schema="doc_id long, text string",
    )
    rows = {r.doc_id: r.text for r in remove_repeated_paragraphs(df).collect()}
    assert rows[0] == "aa bb\n\ncc dd\n\nee"
    assert rows[1] == "xx"


def test_paragraph_dedup_cross_doc(spark):
    df = spark.createDataFrame(
        [
            (0, "shared boiler\n\nunique zero"),
            (1, "shared boiler\n\nunique one"),
            (2, "unique two\n\nshared boiler"),
        ],
        schema="doc_id long, text string",
    )
    rows = {r.doc_id: r.text for r in paragraph_dedup(df).collect()}
    # paragraph survives only in the earliest doc containing it
    assert rows[0] == "shared boiler\n\nunique zero"
    assert rows[1] == "unique one"
    assert rows[2] == "unique two"
