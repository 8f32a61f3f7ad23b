"""Round-5e: ES ingest-pipeline processors and transform latest mode."""

import datetime as dt
import hashlib

import pytest
from pyspark.sql import functions as F


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "Hello World", "en", "src12", 200),
            (2, "Bonjour", "fr", "src3", 50),
            (3, "Hallo Welt", "de", "src7", 300),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_set_rename_remove_convert(spark):
    from engine.ingest import apply_pipeline

    out = apply_pipeline(
        _docs(spark),
        [
            {"set": {"field": "tag", "value": "x"}},
            {"rename": {"field": "source", "target_field": "src"}},
            {"gsub": {"field": "src", "pattern": "[^0-9]", "replacement": ""}},
            {"convert": {"field": "src", "type": "long"}},
            {"remove": {"field": "text"}},
        ],
    ).collect()
    assert all(r["tag"] == "x" for r in out)
    assert {r["doc_id"]: r["src"] for r in out} == {1: 12, 2: 3, 3: 7}
    assert "text" not in out[0].asDict()


def test_set_copy_from_and_no_override(spark):
    from engine.ingest import apply_pipeline

    out = apply_pipeline(
        _docs(spark),
        [
            {"set": {"field": "lang2", "copy_from": "lang"}},
            {"set": {"field": "lang2", "value": "xx", "override": False}},
        ],
    ).collect()
    assert {r["lang2"] for r in out} == {"en", "fr", "de"}


def test_case_trim_split_join_append(spark):
    from engine.ingest import apply_pipeline

    df = spark.createDataFrame([("  a b  ",)], "s string")
    out = apply_pipeline(
        df,
        [
            {"trim": {"field": "s"}},
            {"uppercase": {"field": "s", "target_field": "u"}},
            {"split": {"field": "s", "separator": " "}},
            {"join": {"field": "s", "separator": "-", "target_field": "j"}},
            {"append": {"field": "s", "value": ["c", "c"], "allow_duplicates": False}},
        ],
    ).collect()[0]
    assert out["u"] == "A B"
    assert out["j"] == "a-b"
    assert out["s"] == ["a", "b", "c"]


def test_csv_and_date(spark):
    from engine.ingest import apply_pipeline

    df = spark.createDataFrame([("3,foo,2024-05-01",)], "line string")
    out = apply_pipeline(
        df,
        [
            {"csv": {"field": "line", "target_fields": ["n", "name", "d"]}},
            {"date": {"field": "d", "formats": ["yyyy/MM/dd", "yyyy-MM-dd"],
                      "target_field": "ts"}},
        ],
    ).collect()[0]
    assert (out["n"], out["name"]) == ("3", "foo")
    assert out["ts"] == dt.datetime(2024, 5, 1)


def test_fingerprint_matches_md5(spark):
    from engine.ingest import apply_pipeline

    out = apply_pipeline(
        _docs(spark), [{"fingerprint": {"fields": ["doc_id", "lang"]}}]
    ).collect()
    for r in out:
        want = hashlib.md5(f"{r['doc_id']}|{r['lang']}".encode()).hexdigest()
        assert r["fingerprint"] == want


def test_drop_if_and_conditional_set(spark):
    from engine.ingest import apply_pipeline

    out = apply_pipeline(
        _docs(spark),
        [
            {"set": {"field": "grade", "value": "long", "if": "n_chars >= 200"}},
            {"drop": {"if": "n_chars < 100"}},
        ],
    ).collect()
    got = {r["doc_id"]: r["grade"] for r in out}
    assert got == {1: "long", 3: "long"}
    assert 2 not in got


def test_enrich_broadcasts_and_script_raises(spark):
    from engine.ingest import apply_pipeline

    dim = spark.createDataFrame(
        [("en", "germanic"), ("fr", "romance")], "lang string, family string"
    )
    out = apply_pipeline(
        _docs(spark),
        [{"enrich": {"policy_name": "dim", "match_field": "lang"}}],
        resolve=lambda n: {"dim": dim}[n],
    )
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()
    assert {r["doc_id"]: r["family"] for r in out.collect()} == {
        1: "germanic", 2: "romance", 3: None,
    }
    with pytest.raises(NotImplementedError):
        apply_pipeline(_docs(spark), [{"script": {"source": "ctx.x = 1"}}])
    with pytest.raises(ValueError, match="unsupported processor"):
        apply_pipeline(_docs(spark), [{"frobnicate": {}}])


def test_pipeline_is_single_stage_projection(spark):
    """The whole expression chain must collapse into a scan + project —
    no shuffle, no UDF (the 100-TB shape claimed in the module docstring)."""
    from engine.ingest import apply_pipeline

    out = apply_pipeline(
        _docs(spark),
        [
            {"set": {"field": "tag", "value": "x"}},
            {"gsub": {"field": "source", "pattern": "[^0-9]", "replacement": ""}},
            {"fingerprint": {"fields": ["doc_id", "lang"]}},
            {"drop": {"if": "n_chars < 100"}},
        ],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_transform_latest_keyed_window(spark):
    from engine.aggs import transform_latest

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (1, 10, base + dt.timedelta(hours=1)),
            (2, 10, base + dt.timedelta(hours=2)),  # latest for user 10
            (3, 20, base + dt.timedelta(hours=2)),
            (4, 20, base + dt.timedelta(hours=2)),  # tie -> higher event_id
        ],
        "event_id long, user_id long, ts timestamp",
    )
    out = transform_latest(df, "user_id", "ts", "event_id").collect()
    assert {r["user_id"]: r["event_id"] for r in out} == {10: 2, 20: 4}


def test_esql_enrich_with_projection_and_broadcast(spark):
    from engine.esql import esql

    dim = spark.createDataFrame(
        [("en", "germanic", "x"), ("fr", "romance", "y")],
        "lang string, family string, junk string",
    )
    out = esql(
        "FROM docs | ENRICH pol ON lang WITH family | SORT doc_id",
        lambda n: {"docs": _docs(spark), "pol": dim}[n],
    )
    assert "junk" not in out.columns  # WITH projects the enrich fields
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert [r["family"] for r in out.collect()] == ["germanic", "romance", None]

    with pytest.raises(ValueError, match="ENRICH needs ON"):
        esql("FROM docs | ENRICH pol", lambda n: _docs(spark))


def test_esql_sample_is_deterministic_hash_filter(spark):
    from engine.esql import esql
    from engine.sample import portable_hash_expr

    docs = _docs(spark)
    out = esql(
        "FROM docs | SAMPLE 0.5 ON doc_id | KEEP doc_id",
        lambda n: docs,
    ).collect()
    want = (
        docs.filter((portable_hash_expr("doc_id") % 1000) < 500)
        .select("doc_id").collect()
    )
    assert sorted(r["doc_id"] for r in out) == sorted(r["doc_id"] for r in want)

    with pytest.raises(ValueError, match="probability"):
        esql("FROM docs | SAMPLE 1.5", lambda n: docs)


def test_analyze_api_keeps_position_gaps(spark):
    """_analyze reports original-stream positions: removed stopwords leave
    gaps (ES position-increment semantics)."""
    import __spark_entry__ as se

    out = se.queries()["analyze_api"](spark, "/root/testdata/sf0.001").collect()
    got = [(r["position"], r["token"]) for r in out]
    # 'The'(0), 'and'(5), 'the'(6) are stopwords -> positions 0/5/6 absent
    assert got == [
        (1, "table"), (2, "hold"), (3, "many"), (4, "query"),
        (7, "merge"), (8, "stream"), (9, "briskly"),
    ]


def test_ingest_pipeline_streams_identically(spark, tmp_path):
    """D80 × J1: the processor chain is a stateless projection, so the SAME
    apply_pipeline call must run unchanged on a readStream and produce the
    batch result (availableNow, memory sink)."""
    from engine.ingest import apply_pipeline

    src = str(tmp_path / "docs_src")
    _docs(spark).write.parquet(src)
    procs = [
        {"set": {"field": "tag", "value": "x"}},
        {"gsub": {"field": "source", "pattern": "[^0-9]", "replacement": ""}},
        {"convert": {"field": "source", "type": "long"}},
        {"fingerprint": {"fields": ["doc_id", "lang"]}},
        {"drop": {"if": "n_chars < 100"}},
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        apply_pipeline(stream, procs)
        .writeStream.format("memory")
        .queryName("ingest_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM ingest_stream").collect()
    )
    want = sorted(
        tuple(r)
        for r in apply_pipeline(spark.read.schema(schema).parquet(src), procs)
        .collect()
    )
    assert got == want and len(got) == 2
