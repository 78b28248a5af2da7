"""Engine-portable span arithmetic (operators/spanops.py): the prefix-sum
offsets must agree with the kernel's DOM walk and satisfy the substring
invariant in-engine."""
from __future__ import annotations

from pyspark.sql import functions as F

from readability_ex_spark.operators.spanops import (
    _block_expr,
    q_spans_tiling,
    tile_block_spans,
)


def test_tile_block_spans_offsets_and_invariant(spark):
    df = spark.createDataFrame(
        [
            (1, ["alpha beta", "gamma", "delta epsilon zeta"]),
            (2, ["single"]),
            (3, []),  # no blocks -> no rows
        ],
        "doc_id long, blocks array<string>",
    )
    rows = tile_block_spans(df).orderBy("doc_id", "block_idx").collect()
    got = [(r.doc_id, r.block_idx, r.span_start, r.span_end) for r in rows]
    # "alpha beta gamma delta epsilon zeta": blocks at 0-10, 11-16, 17-35
    assert got == [
        (1, 0, 0, 10),
        (1, 1, 11, 16),
        (1, 2, 17, 35),
        (2, 0, 0, 6),
    ]
    assert all(r.slice_ok for r in rows)


def test_tile_matches_kernel_block_spans():
    """The Spark prefix-sum arithmetic and the kernel DOM walk compute
    the SAME offsets when the document is exactly space-joined blocks."""
    from readability_ex_spark.kernel import dom
    from readability_ex_spark.kernel.spans import block_spans

    blocks = ["first block text", "second one", "a third block here"]
    html = (
        "<html><body><div>"
        + " ".join(f"<p>{b}</p>" for b in blocks).replace("</p> <p>", "</p> <p>")
        + "</div></body></html>"
    )
    tree = dom.parse_document(html)
    text = dom.text(tree)
    kernel_spans = [(s, e) for _, s, e in block_spans(tree)]
    # mirror with the pure arithmetic (sep=" " matches the inter-<p>
    # whitespace text node)
    starts, pos = [], 0
    for b in blocks:
        starts.append((pos, pos + len(b)))
        pos += len(b) + 1
    assert kernel_spans == starts
    for s, e in kernel_spans:
        assert text[s:e] in blocks


def test_block_expr_empty_and_null(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "   "), (3, "one two three")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.b
        for r in df.select("doc_id", _block_expr().alias("b")).collect()
    }
    assert out[1] == [] and out[2] == []
    assert out[3] == ["one two three"]


def test_q_spans_tiling_all_slices_ok(spark):
    out = q_spans_tiling(spark, "/root/testdata/sf0.001")
    assert out.filter(~F.col("slice_ok")).count() == 0
    assert out.count() > 0
