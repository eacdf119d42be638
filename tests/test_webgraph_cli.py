"""tools/webgraph.py — the spark-submit webgraph report CLI.

Drives main() in-process (captured stdout) over a deterministic
link table, asserting the WEBGRAPH_STATS stdout contract and the
parquet outputs; the spark-submit launch path follows the
tools/curate.py / query_graph.py convention."""

import importlib.util
from pathlib import Path

import pytest

_CLI = Path(__file__).resolve().parents[1] / "tools" / "webgraph.py"


def _load_cli():
    spec = importlib.util.spec_from_file_location("webgraph", _CLI)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_webgraph_cli_report(spark, tmp_path, capsys):
    links = []
    # two mutually-linking hosts (an SCC) + a spoke host linking in
    for i in range(6):
        links.append((f"https://a.example/p{i}", f"https://b.example/p{i}"))
        links.append((f"https://b.example/p{i}", f"https://a.example/p{i}"))
    links += [(f"https://spoke{j}.example/x", "https://a.example/hub")
              for j in range(5)]
    src = str(tmp_path / "links")
    spark.createDataFrame(links, "src string, dst string") \
         .write.parquet(src)
    out = str(tmp_path / "report")
    cli = _load_cli()
    cli.main([src, out, "--iters", "2", "--seeds-min-indegree", "2"])
    txt = capsys.readouterr().out
    assert "WEBGRAPH_STATS stage=links n=17" in txt
    assert "stage=host_graph" in txt and "hosts=7" in txt
    assert "stage=trustrank seeds=" in txt
    assert "stage=scc components=" in txt and "largest=2" in txt
    assert "stage=assortativity" in txt
    ranks = spark.read.parquet(out + "/ranks")
    assert {"node", "rank_micro", "trust_micro",
            "spam_mass_micro"} <= set(ranks.columns)
    comps = {r["id"]: r["comp"]
             for r in spark.read.parquet(out + "/scc").collect()}
    assert comps["a.example"] == comps["b.example"]


def test_webgraph_cli_empty_input_fails(spark, tmp_path):
    src = str(tmp_path / "empty")
    spark.createDataFrame([], "src string, dst string") \
         .write.parquet(src)
    cli = _load_cli()
    with pytest.raises(SystemExit, match="empty"):
        cli.main([src, str(tmp_path / "o")])
