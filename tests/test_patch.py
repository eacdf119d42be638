"""Patch-application operator (reference patch_if_needed /
patchit.py analog): unified-diff parse, strict-context apply,
conflict flagging, Spark plumbing."""

import pytest
from pyspark.sql import Row

from ferenda_spark.operators.patch import (
    PatchSyntaxError,
    apply_patch_text,
    apply_patches,
    parse_unified_diff,
)

DOC = "alpha beta\ngamma delta\nepsilon zeta\neta theta"

PATCH = """--- a/doc
+++ b/doc
@@ -2,2 +2,2 @@ fix middle
 gamma delta
-epsilon zeta
+EPSILON ZETA
"""


def test_parse_unified_diff():
    hunks, desc = parse_unified_diff(PATCH)
    assert desc == "fix middle"
    assert len(hunks) == 1
    src_start, src_len, dst_start, dst_len, body = hunks[0]
    assert (src_start, src_len, dst_start, dst_len) == (2, 2, 2, 2)
    assert body == [(" ", "gamma delta"), ("-", "epsilon zeta"),
                    ("+", "EPSILON ZETA")]


def test_apply_patch_text_golden():
    patched, status, desc = apply_patch_text(DOC, PATCH)
    assert status == "applied"
    assert desc == "fix middle"
    assert patched == "alpha beta\ngamma delta\nEPSILON ZETA\neta theta"


def test_apply_patch_multi_hunk():
    patch = ("@@ -1,1 +1,1 @@ two hunks\n"
             "-alpha beta\n"
             "+ALPHA BETA\n"
             "@@ -4,1 +4,1 @@\n"
             "-eta theta\n"
             "+ETA THETA")
    patched, status, desc = apply_patch_text(DOC, patch)
    assert status == "applied"
    assert desc == "two hunks"
    assert patched == "ALPHA BETA\ngamma delta\nepsilon zeta\nETA THETA"


def test_apply_patch_conflict_keeps_original():
    bad = "@@ -2,1 +2,1 @@ nope\n-NOT IN THE DOC\n+whatever"
    patched, status, desc = apply_patch_text(DOC, bad)
    assert status == "conflict"
    assert desc == "nope"
    assert patched == DOC


def test_apply_patch_out_of_range_is_conflict():
    bad = "@@ -99,1 +99,1 @@\n-alpha beta\n+x"
    patched, status, _ = apply_patch_text(DOC, bad)
    assert status == "conflict"
    assert patched == DOC


def test_syntax_error():
    with pytest.raises(PatchSyntaxError):
        parse_unified_diff("this is not a diff")
    patched, status, _ = apply_patch_text(DOC, "garbage")
    assert status == "syntax_error"
    assert patched == DOC


def test_empty_line_content():
    doc = "one\n\nthree"
    patch = "@@ -1,3 +1,3 @@\n one\n-\n+TWO\n three"
    patched, status, _ = apply_patch_text(doc, patch)
    assert status == "applied"
    assert patched == "one\nTWO\nthree"


def test_apply_patches_dataframe(spark):
    docs = spark.createDataFrame([
        Row(doc_id=1, text=DOC),
        Row(doc_id=2, text=DOC),
        Row(doc_id=3, text="unrelated\ncontent"),
    ])
    patches = spark.createDataFrame([
        Row(doc_id=1, patch=PATCH),
        Row(doc_id=3, patch="@@ -1,1 +1,1 @@ broken\n-nope\n+x"),
    ])
    out = {r["doc_id"]: r for r in apply_patches(docs, patches).collect()}
    assert out[1]["patch_status"] == "applied"
    assert "EPSILON ZETA" in out[1]["patched_text"]
    assert out[1]["patch_desc"] == "fix middle"
    assert out[2]["patch_status"] is None        # no patch → passthrough
    assert out[2]["patched_text"] == DOC
    assert out[3]["patch_status"] == "conflict"  # context mismatch
    assert out[3]["patched_text"] == "unrelated\ncontent"
    # original columns preserved
    assert set(out[1].asDict()) == {
        "doc_id", "text", "patched_text", "patch_status", "patch_desc"}


def test_null_text_is_per_row_conflict():
    patched, status, _ = apply_patch_text(None, PATCH)
    assert status == "conflict" and patched is None


def test_no_newline_marker_tolerated():
    patch = ("@@ -4,1 +4,1 @@\n"
             "-eta theta\n"
             "\\ No newline at end of file\n"
             "+ETA THETA\n"
             "\\ No newline at end of file")
    patched, status, _ = apply_patch_text(DOC, patch)
    assert status == "applied"
    assert patched.endswith("ETA THETA")


def test_apply_patches_null_text_row(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=None), Row(doc_id=2, text=DOC)])
    patches = spark.createDataFrame([Row(doc_id=1, patch=PATCH),
                                     Row(doc_id=2, patch=PATCH)])
    out = {r["doc_id"]: r for r in apply_patches(docs, patches).collect()}
    assert out[1]["patch_status"] == "conflict"   # not a stage crash
    assert out[1]["patched_text"] is None
    assert out[2]["patch_status"] == "applied"
