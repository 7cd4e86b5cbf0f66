"""Text-analysis pack tests: language-ID on real sentences, token
counting edge cases, quality-score ordering, winnowing locality."""

from __future__ import annotations

from pyspark.sql import functions as F

from sycl_mapreduce_cpu_gpu_hybrid_spark.functions.text import (
    bpe_ish_token_count,
    lang_id,
    quality_score,
    whitespace_token_count,
    winnowing_fingerprints,
)


def test_lang_id_real_sentences(spark):
    rows = [
        ("en", "the cat sat on the mat and it is happy that the sun is out"),
        ("de", "der hund ist nicht auf der couch und die katze ist mit dem ball"),
        ("fr", "le chat est dans la maison et les enfants sont pour une promenade"),
        ("es", "el perro es una mascota y los gatos no quieren salir por la noche"),
        ("und", "zzz qqq xxx yyy"),
    ]
    df = spark.createDataFrame(rows, "expected string, text string")
    out = df.select("expected", lang_id("text").alias("pred")).collect()
    for r in out:
        assert r["pred"] == r["expected"], f"{r['expected']} misdetected as {r['pred']}"


def test_token_counts_edges(spark):
    df = spark.createDataFrame(
        [("",), ("   ",), ("one",), ("two words",), ("a-b c,d 42",)], "t string"
    )
    out = df.select(
        whitespace_token_count("t").alias("ws"), bpe_ish_token_count("t").alias("bpe")
    ).collect()
    assert [r["ws"] for r in out] == [0, 0, 1, 2, 3]
    # 'a-b c,d 42' -> a,-,b,c,',',d,4,2 = 8 BPE-ish tokens
    assert [r["bpe"] for r in out] == [0, 0, 1, 2, 8]


def test_quality_orders_clean_above_garbage(spark):
    df = spark.createDataFrame(
        [
            ("clean", "a well formed english sentence with normal words here"),
            ("garbage", "!!! ??? ,,, ;;; ### 111 222 @@@ %%%"),
        ],
        "kind string, t string",
    )
    out = {r["kind"]: r["q"] for r in df.select("kind", quality_score("t").alias("q")).collect()}
    assert out["clean"] > out["garbage"]
    assert 0.0 <= out["garbage"] < out["clean"] <= 1.0


def test_winnowing_identity_and_locality(spark):
    base = "the quick brown fox jumps over the lazy dog again and again padding"
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, base + " with a short extra suffix")],
        "doc_id int, text string",
    )
    fps = winnowing_fingerprints(df, k=8, window=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert by_doc[1] == by_doc[2]  # identical docs -> identical fingerprints
    # appended suffix: shared prefix keeps most fingerprints (locality)
    inter = len(by_doc[1] & by_doc[3])
    assert inter / len(by_doc[1]) > 0.8
    assert by_doc[3] != by_doc[1]


def test_winnowing_guarantee(spark):
    """Any shared substring of length >= k + window - 1 must produce at
    least one shared fingerprint (the winnowing guarantee)."""
    shared = "zqxjkvbwpfmg hydra"  # 18 chars >= 8 + 4 - 1
    df = spark.createDataFrame(
        [(1, "AAAA " + shared + " BBBB"), (2, "CCCC " + shared + " DDDD")],
        "doc_id int, text string",
    )
    fps = winnowing_fingerprints(df, k=8, window=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert by_doc[1] & by_doc[2]
