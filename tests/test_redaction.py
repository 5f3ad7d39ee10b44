"""PII redaction: Java-regex vs RE2 agreement on adversarial strings, and
unit checks of the redaction contract (count-before-replace, pattern
order). The registered query's full-corpus hash parity runs in
test_oracle_parity like every other oracled query."""

from __future__ import annotations

import duckdb

from clinical_search_data_pipeline_spark.operators.redaction import (
    PII_PATTERNS,
    _duck_count,
    _duck_redact,
    redact_pii,
)

# Adversarial corpus: multiplicity, adjacency, overlap-with-other-classes,
# boundary digits, and clean strings. Each case exercises a spot where a
# leftmost-first (Java) vs leftmost-longest engine COULD diverge if the
# patterns were ambiguous; the contract is that ours are not.
CASES = [
    "plain words no pii at all",
    "a@b.io",  # minimal email
    "x a@b.io y c.d-e@sub.host.org z",  # two emails, dotted local+host
    "tel +1-555-123-4567 end",  # phone
    "+12-555-123-4567+1-555-000-1111",  # adjacent phones, 2-digit country
    "ip 10.0.0.1 then 255.255.255.255.255",  # 5 octets: leftmost 4 match
    "999.999.999.999",  # out-of-range octets still match the regex (by design)
    "mail 10.2.3.4@host.com ip",  # email whose local part looks like an IP
    "+1-555-123-4567@x.org",  # email containing a phone-shaped local part
    "v1.2.3.4b",  # version-ish: digits flanked by letters still match the IP
    "dots...everywhere .. 1.2 3.4",  # partial IPs must NOT match
    "UPPER@CASE.COM and MiXeD@CaSe.Io",
]


def test_java_and_re2_agree_on_counts_and_redaction(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(CASES)], "id long, text string")
    got = {
        r["id"]: r.asDict()
        for r in redact_pii(df).orderBy("id").collect()
    }
    con = duckdb.connect()
    try:
        counts = ", ".join(
            f"{_duck_count('text', pat)}::INT AS n_{kind}" for kind, pat, _ in PII_PATTERNS
        )
        rows = con.execute(
            f"SELECT id, {counts}, {_duck_redact('text')} AS redacted "
            "FROM (SELECT unnest(range(len($1::VARCHAR[]))) AS id, "
            "unnest($1::VARCHAR[]) AS text)",
            [CASES],
        ).fetchall()
    finally:
        con.close()
    for row in rows:
        rid, n_email, n_phone, n_ip, redacted = row
        g = got[rid]
        assert (g["n_email"], g["n_phone"], g["n_ip"]) == (n_email, n_phone, n_ip), (
            CASES[rid],
            g,
            row,
        )
        assert g["redacted"] == redacted, (CASES[rid], g["redacted"], redacted)


def test_counts_taken_before_replacement(spark):
    # An email whose host is IP-shaped: after email-redaction the IP text is
    # gone, but n_ip must still see the original (count-before-replace).
    df = spark.createDataFrame([(0, "x 1.2.3.4@9.9.9.9.example.com y")], "id long, text string")
    r = redact_pii(df).collect()[0]
    assert r["n_email"] == 1
    assert r["n_ip"] == 2  # both IP-shaped substrings, counted on the original
    assert r["redacted"] == "x <EMAIL> y"  # email pattern swallows the whole token


def test_clean_text_is_untouched(spark):
    df = spark.createDataFrame([(0, "nothing to scrub here")], "id long, text string")
    r = redact_pii(df).collect()[0]
    assert r["redacted"] == "nothing to scrub here"
    assert r["n_email"] == r["n_phone"] == r["n_ip"] == 0
