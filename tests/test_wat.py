"""WAT JSON metadata extraction."""
from aml_entity_resolution_assignment_spark.sources.wat import parse_wat


def test_parse_wat_full_and_non_html(spark):
    full = (
        '{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":"http://a/b",'
        '"Content-Length":"120"},"Payload-Metadata":{"HTTP-Response-Metadata":'
        '{"Response-Message":{"Status":"200"},"HTML-Metadata":{"Head":'
        '{"Title":"T1"},"Links":[{"url":"/a"},{"url":"http://x"}]}}}}}'
    )
    non_html = (
        '{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":"http://a/img",'
        '"Content-Length":"9000"},"Payload-Metadata":{"HTTP-Response-Metadata":'
        '{"Response-Message":{"Status":"200"}}}}}'
    )
    df = spark.createDataFrame([(full,), (non_html,)], "wat string")
    got = {r["uri"]: r for r in parse_wat(df).collect()}
    r = got["http://a/b"]
    assert (r["content_length"], r["status"], r["title"], r["n_links"]) == (
        120, 200, "T1", 2,
    )
    r = got["http://a/img"]
    assert r["content_length"] == 9000 and r["status"] == 200
    assert r["title"] is None and r["n_links"] == 0


def test_parse_wat_keeps_input_columns(spark):
    df = spark.createDataFrame([(7, "{}")], "rid long, wat string")
    row = parse_wat(df).collect()[0]
    assert row["rid"] == 7 and row["uri"] is None and row["n_links"] == 0
