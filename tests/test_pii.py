"""PII detection/redaction on PLANTED data (the synthetic corpus
contains none): counts per pattern, redaction leaves no residual
match, is idempotent, and never touches clean text."""

from __future__ import annotations

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.textstats import (
    PII_PATTERNS,
    pii_stats,
    redact_pii,
)


def _frame(spark):
    rows = [
        (0, "contact bob.smith+spam@example-corp.co.uk or admin@x.io now"),
        (1, "server at 10.0.254.3 responded; backup is 192.168.1.1"),
        (2, "call 555-123-4567 or 02-2345-6789 for help"),
        (3, "mixed: eve@a.org from 8.8.8.8 dialed 555-000-1111"),
        (4, "clean text with no personal data at all"),
        (5, "an email containing a quad 1.2.3.4@host.com stays one email"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_counts(spark):
    got = {
        r.doc_id: (r.n_email, r.n_ipv4, r.n_phone, r.has_pii)
        for r in pii_stats(_frame(spark)).collect()
    }
    assert got[0] == (2, 0, 0, True)
    assert got[1] == (0, 2, 0, True)
    # 02-2345-6789 is not a 3-digit-prefix phone shape: only one match
    assert got[2] == (0, 0, 1, True)
    assert got[3] == (1, 1, 1, True)
    assert got[4] == (0, 0, 0, False)
    # counts are independent per pattern on raw text: the quad inside
    # the address ALSO counts as an ip (documented)
    assert got[5] == (1, 1, 0, True)


def test_redaction_complete_and_idempotent(spark):
    red = redact_pii(_frame(spark))
    # no residual match of any pattern in redacted text
    residue = red
    for name, pat, _ in PII_PATTERNS:
        residue = residue.withColumn(
            f"r_{name}", F.regexp_count("text_redacted", F.lit(pat))
        )
    for r in residue.collect():
        assert r.r_email == 0 and r.r_ipv4 == 0 and r.r_phone == 0, r
    # email-first ordering: the quad-bearing address became ONE [EMAIL]
    by_id = {r.doc_id: r.text_redacted for r in red.collect()}
    assert by_id[5] == "an email containing a quad [EMAIL] stays one email"
    assert by_id[3] == "mixed: [EMAIL] from [IP] dialed [PHONE]"
    # clean text untouched
    assert by_id[4] == "clean text with no personal data at all"
    # idempotent: redacting the redacted column changes nothing
    again = redact_pii(
        red.select("doc_id", F.col("text_redacted").alias("text"))
    )
    for r in again.collect():
        assert r.text_redacted == by_id[r.doc_id]


from hypothesis import given, settings
from hypothesis import strategies as st

_fragment = st.sampled_from(
    [
        "plain words here",
        "bob@x.io",
        "10.0.0.1",
        "555-123-4567",
        "a.b@sub.domain.org",
        "1.2.3.4@host.com",
        "not..an@@email",
        "999.999.999.999",
        "12-34",
    ]
)


@settings(max_examples=20, deadline=None)
@given(st.lists(_fragment, min_size=0, max_size=6))
def test_redaction_idempotent_and_clean_property(spark, frags):
    """Property: for any concatenation of PII-ish fragments, redaction
    leaves zero residual matches and a second pass changes nothing."""
    from pyspark.sql import functions as F

    from txf_continuous_data_pipeline_spark.operators.textstats import (
        PII_PATTERNS,
        redact_pii,
    )

    df = spark.createDataFrame([(0, " ".join(frags))], "doc_id long, text string")
    once = redact_pii(df).select(
        "doc_id", F.col("text_redacted").alias("text")
    )
    row1 = once.collect()[0]
    checks = once
    for name, pat, _ in PII_PATTERNS:
        checks = checks.withColumn(name, F.regexp_count("text", F.lit(pat)))
    c = checks.collect()[0]
    assert c.email == 0 and c.ipv4 == 0 and c.phone == 0, c
    row2 = redact_pii(once).collect()[0]
    assert row2.text_redacted == row1.text


def test_pii_redact_full_recall_and_idempotent(spark, sf_dir):
    """Every document carries planted PII, so the redact query must
    return every doc; redacting already-redacted text is a no-op
    (placeholders contain nothing pattern-matchable)."""
    from txf_continuous_data_pipeline_spark.operators.textstats import (
        redact_pii,
    )
    from txf_continuous_data_pipeline_spark.queries.registry import REGISTRY
    from txf_continuous_data_pipeline_spark.sources import read_table

    n_docs = read_table(spark, sf_dir, "documents").count()
    out = REGISTRY["pii_redact"][0](spark, sf_dir)
    rows = out.collect()
    assert len(rows) == n_docs
    assert all(r["n_chars_removed"] != 0 for r in rows)
    again = redact_pii(
        out.select("doc_id", "text_redacted"), text_col="text_redacted",
        out_col="t3",
    )
    assert again.where("t3 != text_redacted").count() == 0
