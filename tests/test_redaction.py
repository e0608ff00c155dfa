"""PII redaction (pipeline/redaction.py)."""

from __future__ import annotations

import pytest

from flink_streaming_2_10_spark.pipeline.redaction import (
    inject_synthetic_pii,
    redact_pii,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "write to alice.smith+news@sub.example.co.uk for details"),
        (2, "call me at 555-867-5309 or (415) 555-0100 today"),
        (3, "server at 192.168.1.254 and backup at 10.0.0.7"),
        (4, "mixed: bob@ex.io, +1 415.555.2671, host 172.16.254.1"),
        (5, "nothing sensitive here at all"),
        (6, "not-an-email @ example, version 1.2 build 3.4.5.6.7"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_counts(corpus):
    out = {r["doc_id"]: r for r in redact_pii(corpus).collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_phones"] == 0
    assert out[2]["n_phones"] == 2
    assert out[3]["n_ipv4"] == 2
    assert out[4]["n_emails"] == 1 and out[4]["n_phones"] == 1
    assert out[4]["n_ipv4"] == 1
    assert out[5]["n_emails"] == out[5]["n_phones"] == out[5]["n_ipv4"] == 0


def test_redacted_text_has_no_residual_pii(corpus):
    out = {r["doc_id"]: r["clean_text"] for r in redact_pii(corpus).collect()}
    assert "[EMAIL]" in out[1] and "alice" not in out[1].split("[EMAIL]")[1]
    assert out[2].count("[PHONE]") == 2 and "5309" not in out[2]
    assert out[3].count("[IP]") == 2 and "192.168" not in out[3]
    assert out[5] == "nothing sensitive here at all"


def test_clean_text_untouched_when_no_pii(corpus):
    row = redact_pii(corpus.filter("doc_id = 5")).collect()[0]
    assert row["clean_text"] == "nothing sensitive here at all"


def test_synthetic_injection_is_deterministic_and_detected(spark):
    df = spark.createDataFrame(
        [(0, "base"), (3, "base"), (5, "base"), (7, "base"), (105, "base")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in redact_pii(inject_synthetic_pii(df)).collect()}
    # id 0 divisible by 3, 5 and 7 -> all three kinds injected and caught
    assert out[0]["n_emails"] == 1 and out[0]["n_phones"] == 1
    assert out[0]["n_ipv4"] == 1
    assert out[3]["n_emails"] == 1 and out[3]["n_phones"] == 0
    assert out[5]["n_phones"] == 1 and out[5]["n_emails"] == 0
    assert out[7]["n_ipv4"] == 1
    # 105 = 3*5*7 -> all three again
    assert (
        out[105]["n_emails"] == out[105]["n_phones"] == out[105]["n_ipv4"] == 1
    )
