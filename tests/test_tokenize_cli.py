"""tools/tokenize_corpus.py — the spark-submit tokenizer CLI."""

import importlib.util
from pathlib import Path

_CLI = Path(__file__).resolve().parents[1] / "tools" / "tokenize_corpus.py"


def _load_cli():
    spec = importlib.util.spec_from_file_location("tokenize_corpus",
                                                  _CLI)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_tokenize_cli_train_encode_reuse(spark, tmp_path, capsys):
    docs = spark.createDataFrame(
        [(1, "the thin thing then the"), (2, "the other brother the"),
         (3, "thermal the the the")], "doc_id long, text string")
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    out = str(tmp_path / "tok")
    cli = _load_cli()
    assert cli.main([src, out, "--merges", "4"]) == 0
    txt = capsys.readouterr().out
    assert "stage=input docs=3" in txt
    assert "stage=trained merges=4 top=t+h:" in txt
    assert "stage=encode docs=3" in txt

    merges = {(r["rank"], r["left"], r["right"])
              for r in spark.read.parquet(f"{out}/merges").collect()}
    assert (0, "t", "h") in merges and (1, "th", "e") in merges
    toks = {r["doc_id"]: r for r in
            spark.read.parquet(f"{out}/tokens").collect()}
    assert toks[3]["tokens"][:1] == ["ther"] or "the" in toks[3]["tokens"]
    assert all(r["n_tokens"] == len(r["tokens"]) for r in toks.values())

    # reuse path: identical encode without retraining
    out2 = str(tmp_path / "tok2")
    assert cli.main([src, out2, "--reuse-merges",
                     f"{out}/merges"]) == 0
    assert "stage=reused merges=4" in capsys.readouterr().out
    t2 = {r["doc_id"]: r["tokens"] for r in
          spark.read.parquet(f"{out2}/tokens").collect()}
    assert t2 == {k: r["tokens"] for k, r in toks.items()}


def test_tokenize_cli_refuses_empty_and_dry(spark, tmp_path, capsys):
    cli = _load_cli()
    empty = str(tmp_path / "empty")
    spark.createDataFrame([], "doc_id long, text string") \
        .write.parquet(empty)
    assert cli.main([empty, str(tmp_path / "o1")]) == 1
    # hapax-only corpus: nothing clears the default frequency floor
    hapax = str(tmp_path / "hapax")
    spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string") \
        .write.parquet(hapax)
    assert cli.main([hapax, str(tmp_path / "o2")]) == 1
    assert "merges=0" in capsys.readouterr().out
