"""tools/query_graph.py — the spark-submit SPARQL serving CLI.

Drives run() in-process (captured stdout) against a real GraphStore
built by the pipeline, asserting the ROW / TRIPLE / DONE stdout
contract matches a direct edge-view query.  The spark-submit launch
itself is exercised by the verify recipe; this test pins the CLI's
parsing, store wiring, and output format.
"""

import importlib.util
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from ferenda_spark.fixtures.pages import entities_df, pages_df
from ferenda_spark.operators.graph import GraphStore
from ferenda_spark.pipeline import run_pipeline

_CLI = Path(__file__).resolve().parents[1] / "tools" / "query_graph.py"


def _load_cli():
    spec = importlib.util.spec_from_file_location("query_graph", _CLI)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def store_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("cli") / "graph"
    store = GraphStore(spark, str(d))
    run_pipeline(spark, pages_df(spark, 30, partitions=2),
                 entities_df(spark), store)
    return str(d)


def _run_cli(spark, capsys, store_dir, query_path, *params):
    cli = _load_cli()
    cli.run(spark, [store_dir, str(query_path), *params])
    return capsys.readouterr().out.splitlines()


def test_select_rows_match_edge_view(spark, store_dir, tmp_path,
                                     capsys):
    rq = tmp_path / "q.rq"
    rq.write_text(
        "PREFIX dcterms: <http://purl.org/dc/terms/>\n"
        "SELECT DISTINCT ?doc ?target WHERE {\n"
        "  ?doc dcterms:references ?target .\n}\n")
    lines = _run_cli(spark, capsys, store_dir, rq)

    rows = [tuple(ln.split("\t")[1:]) for ln in lines
            if ln.startswith("ROW\t")]
    expected = {(r["subj"], r["obj"]) for r in
                GraphStore(spark, store_dir).read_current("edge")
                .filter(F.col("pred") == "dcterms:references")
                .select("subj", "obj").distinct().collect()}
    assert set(rows) == expected and len(rows) == len(expected)
    assert rows == sorted(rows)                      # orderBy contract
    assert lines[-1] == f"DONE {len(rows)} rows"


def test_order_by_sequence_preserved(spark, store_dir, tmp_path,
                                     capsys):
    """A query's ORDER BY defines the printed row sequence — the CLI
    must not re-sort it away (only order-free queries get the
    deterministic column sort)."""
    rq = tmp_path / "o.rq"
    rq.write_text(
        "SELECT ?p (COUNT(*) AS ?n) WHERE { ?s ?p ?o . }\n"
        "GROUP BY ?p ORDER BY DESC(?n) ?p LIMIT 4\n")
    lines = _run_cli(spark, capsys, store_dir, rq)
    rows = [ln.split("\t")[1:] for ln in lines if ln.startswith("ROW\t")]
    assert rows and lines[-1] == f"DONE {len(rows)} rows"
    keyed = [(-int(n), p) for p, n in rows]
    assert keyed == sorted(keyed)          # DESC(?n), ?p sequence kept
    assert [p for p, _ in rows] != sorted(p for p, _ in rows) or \
        len({n for _, n in rows}) == 1     # genuinely not column-sorted


def test_construct_triples_and_params(spark, store_dir, tmp_path,
                                      capsys):
    rq = tmp_path / "c.rq"
    rq.write_text(
        "PREFIX dcterms: <http://purl.org/dc/terms/>\n"
        "CONSTRUCT { ?t dcterms:isReferencedBy ?d } WHERE {\n"
        "  ?d dcterms:references ?t .\n"
        "  FILTER(strstarts(str(?t), \"%(prefix)s\"))\n}\n")
    lines = _run_cli(spark, capsys, store_dir, rq,
                     "prefix=https://example.org/res/rfc/2")
    triples = [ln for ln in lines if ln.startswith("TRIPLE ")]
    assert triples and lines[-1] == f"DONE {len(triples)} rows"
    assert all(" <dcterms:isReferencedBy> " in t and t.endswith(" .")
               for t in triples)
    assert all(t.split()[1].startswith("<https://example.org/res/rfc/2")
               for t in triples)
