"""operators/incremental.assign_new_records on synthetic frames — covers
the paths the labeled catalog fixture never takes (every fixture page
matches): singleton fallback, the all-key-rows-joined-but-invalid trap,
and cross-cluster distance ties.  Both the batch (slim-dedup + final
left join) and streaming-shape (validity-in-key, dedup_pairs=False)
paths must agree row-for-row."""

import pytest

from spellchecker_wasm_spark.operators.incremental import (
    assign_new_records, standing_index)


@pytest.fixture(scope="module")
def frames(spark):
    pages = spark.createDataFrame(
        [(10, "abcdefgh"), (11, "abcdefg"), (20, "azcdefgh"),
         (30, "qrstuvwxyz")],
        "page_id long, title string")
    asg = spark.createDataFrame(
        [(10, 10), (11, 10), (20, 20), (30, 30)],
        "page_id long, component long")
    new = spark.createDataFrame(
        [(101, "abcdefgx"),    # distance 1 to cluster 10 (two pages)
         (102, "accdefgh"),    # distance-1 TIE: comp 10 vs comp 20
         (103, "zzzzzzz"),     # shares no key with anything -> singleton
         (104, "qrstuvw")],    # EVERY key row joins page 30 (identical
                               # prefix) but |len 7 - len 10| > 2: all
                               # hits invalid -> must still surface as a
                               # singleton (the row-filter trap)
        "page_id long, title string")
    return pages, asg, new


EXPECTED = {
    101: (1, 10),   # matched, assigned to cluster 10
    102: (1, 10),   # tie at distance 1 -> min component wins
    103: (0, 103),  # singleton
    104: (0, 104),  # singleton despite all-joined key rows
}


def _check(rows):
    got = {r["new_page_id"]: (r["matched"], r["component"]) for r in rows}
    assert got == EXPECTED


def test_batch_path(spark, frames):
    pages, asg, new = frames
    _check(assign_new_records(new, pages, asg).collect())


def test_streaming_shape_path(spark, frames):
    # dedup_pairs=False exercises the validity-in-key plan on a static
    # frame — the exact plan the streaming catalog query runs
    pages, asg, new = frames
    _check(assign_new_records(new, pages, asg,
                              dedup_pairs=False).collect())


def test_paths_agree(spark, frames):
    pages, asg, new = frames
    a = sorted(map(tuple, assign_new_records(new, pages, asg).collect()))
    b = sorted(map(tuple, assign_new_records(
        new, pages, asg, dedup_pairs=False).collect()))
    assert a == b


def test_prebuilt_index(spark, frames):
    pages, asg, new = frames
    idx = standing_index(pages, asg).persist()
    try:
        _check(assign_new_records(new, pages, asg, dedup_pairs=False,
                                  index=idx).collect())
    finally:
        idx.unpersist()


def test_dedup_on_stream_rejected(spark, frames):
    pages, asg, _ = frames
    import tempfile

    d = tempfile.mkdtemp(prefix="inc_stream_rej_")
    pages.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(pages.schema).parquet(d)
    with pytest.raises(ValueError):
        assign_new_records(stream, pages, asg, dedup_pairs=True)
