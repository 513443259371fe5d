"""Batch 102: Kadane body extraction, WARC round-trip."""

import hashlib
import os


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


DOCS = "doc_id long, text string, lang string, source string, n_chars long"


def _is_boiler(doc_id, pos):
    h = int(hashlib.md5(f"{doc_id}:{pos}".encode()).hexdigest()[:15], 16)
    return h % 3 == 0


def test_body_span_matches_python_kadane(spark, tmp_path):
    """The engine's windowed Kadane equals a plain python Kadane with
    identical tie rules on several docs."""
    from pliers_spark.queries import QUERIES

    rows = [
        (0, "aa bbb c dddd ee fff g hh iiii jj", "en", "s", 30),
        (1, "one two three four five six seven eight", "en", "s", 40),
        (2, "x", "en", "s", 1),
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.doc_id: r for r in QUERIES["body_extraction_span"](spark, sf).collect()}
    for doc_id, text, *_ in rows:
        toks = text.split()
        s = [
            (-len(w) if _is_boiler(doc_id, i) else len(w))
            for i, w in enumerate(toks)
        ]
        # python replica: prefix minus min-prefix, ties earliest end/start
        best = None
        pre = 0
        prefix = []
        for v in s:
            pre += v
            prefix.append(pre)
        for i in range(len(s)):
            mp = min(0, min(prefix[:i], default=0))
            gain = prefix[i] - mp
            if best is None or gain > best[0]:
                best = (gain, i, mp)
        gain, end, mp = best
        start = 0
        if mp < 0:
            for j in range(end):
                if prefix[j] == mp:
                    start = j + 1
                    break
        r = out[doc_id]
        assert (r.body_score, r.body_end, r.body_start) == (gain, end, start)


def test_warc_roundtrip_integrity(spark, tmp_path):
    from pliers_spark.queries import QUERIES

    rows = [
        (7, "hello world content", "en", "s", 19),
        (58, "short", "en", "s", 5),
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.doc_id: r for r in QUERIES["warc_roundtrip"](spark, sf).collect()}
    assert out[7].uri_host == "host7.example"
    assert out[58].uri_host == "host8.example"  # 58 % 50
    assert all(r.payload_ok == 1 and r.length_ok == 1 for r in out.values())
    assert out[7].content_length == 19
