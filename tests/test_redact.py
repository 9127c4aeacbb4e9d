"""PII redaction (operators/redact.py).

Contracts: golden strings for every kind; fixed-order determinism
(card digit runs never double-count as phones); NULL text stays NULL
with zero counts; kind subset selection; unknown kinds raise; the
plan stays JVM-side (no Python eval nodes).
"""
from __future__ import annotations

import contextlib
import io

import pytest

from angle_spark.operators.redact import PII_KINDS, redact_pii

ROWS = [
    (0, "reach me at bob.smith+x@corp.example.org today"),
    (1, "server 192.168.1.254 then 10.0.0.1 twice"),
    (2, "ssn 123-45-6789 on file"),
    (3, "card 4111 1111 1111 1111 charged"),
    (4, "call +1 (415) 555-2671 now"),
    (5, "plain text, nothing sensitive"),
    (6, None),
    (7, "a@b.io mails 9.9.9.9 and 999-88-7777 and 5500 0000 0000 0004"),
]


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_goldens(spark, frame):
    got = {
        r["doc_id"]: r
        for r in redact_pii(frame).collect()
    }
    assert got[0]["text"] == "reach me at [EMAIL] today"
    assert got[0]["n_email"] == 1
    assert got[1]["text"] == "server [IPV4] then [IPV4] twice"
    assert got[1]["n_ipv4"] == 2
    assert got[2]["text"] == "ssn [SSN] on file"
    assert got[2]["n_ssn"] == 1 and got[2]["n_phone"] == 0
    assert got[3]["text"] == "card [CARD] charged"
    assert got[3]["n_card"] == 1 and got[3]["n_phone"] == 0
    assert got[4]["text"] == "call [PHONE] now"
    assert got[4]["n_phone"] == 1
    assert got[5]["text"] == ROWS[5][1]
    assert all(got[5][f"n_{k}"] == 0 for k, _ in PII_KINDS)
    assert got[6]["text"] is None
    assert all(got[6][f"n_{k}"] == 0 for k, _ in PII_KINDS)
    r7 = got[7]
    assert (r7["n_email"], r7["n_ipv4"], r7["n_ssn"], r7["n_card"]) == (
        1, 1, 1, 1,
    )
    assert r7["text"] == "[EMAIL] mails [IPV4] and [SSN] and [CARD]"


def test_kind_subset_and_out_col(spark, frame):
    out = redact_pii(frame, kinds=["email"], out_col="clean").collect()
    by = {r["doc_id"]: r for r in out}
    assert by[0]["clean"] == "reach me at [EMAIL] today"
    assert by[1]["clean"] == ROWS[1][1]  # ips untouched
    assert by[0]["text"] == ROWS[0][1]  # original kept
    assert "n_ipv4" not in out[0].asDict()


def test_unknown_kind_raises(spark, frame):
    with pytest.raises(ValueError, match="unknown PII kinds"):
        redact_pii(frame, kinds=["email", "dna"])


def test_plan_is_jvm_side(spark, frame):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        redact_pii(frame).explain("formatted")
    plan = buf.getvalue()
    # the source scan (createDataFrame) mentions PythonRDD; the redact
    # expressions themselves must be one codegen Project — no Python
    # eval nodes anywhere
    for node in ("BatchEvalPython", "ArrowEval", "MapInPandas", "FlatMapGroups"):
        assert node not in plan
    assert "Project [codegen" in plan
