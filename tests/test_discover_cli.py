"""tools/discover.py — the spark-submit discovery CLI."""

import importlib.util
from pathlib import Path

_CLI = Path(__file__).resolve().parents[1] / "tools" / "discover.py"


def _load_cli():
    spec = importlib.util.spec_from_file_location("discover", _CLI)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_discover_cli_full_round(spark, tmp_path, capsys):
    sm_rows = []
    for h in range(3):
        locs = "".join(
            f"<url><loc>https://h{h}.example/"
            f"{'private/' if h == 2 and i % 2 else 'a/'}{i}</loc></url>"
            for i in range(20))
        sm_rows.append(
            (f"https://h{h}.example/sitemap.xml",
             '<urlset xmlns="http://www.sitemaps.org/schemas/'
             f'sitemap/0.9">{locs}</urlset>'))
    sm_rows.append(("https://bad.example/sitemap.xml", "not xml <"))
    sm = str(tmp_path / "sm")
    spark.createDataFrame(sm_rows, "url string, xml string") \
        .write.parquet(sm)

    ent = "".join(
        f"<entry><id>urn:e:{i}</id><title>t</title>"
        f'<link href="https://h0.example/feed-only/{i}"/>'
        f"<updated>2024-01-01T00:00:00Z</updated></entry>"
        for i in range(10))
    ent += "".join(
        f"<entry><id>urn:o:{i}</id><title>t</title>"
        f'<link href="https://h0.example/a/{i}"/>'
        f"<updated>2024-01-01T00:00:00Z</updated></entry>"
        for i in range(5))
    fd = str(tmp_path / "fd")
    spark.createDataFrame(
        [("https://h0.example/feed",
          '<feed xmlns="http://www.w3.org/2005/Atom">'
          f"<title>f</title>{ent}</feed>")],
        "url string, xml string").write.parquet(fd)

    rb = str(tmp_path / "rb")
    spark.createDataFrame([
        ("h0.example", "User-agent: *\nAllow: /"),
        ("h1.example", "User-agent: *\nCrawl-delay: 2"),
        ("h2.example", "User-agent: *\nDisallow: /private/"),
    ], "domain string, robots_txt string").write.parquet(rb)

    vs = str(tmp_path / "vs")
    spark.createDataFrame(
        [(f"https://h0.example/a/{i}",) for i in range(5)],
        "url string").write.parquet(vs)

    out = str(tmp_path / "out")
    cli = _load_cli()
    rc = cli.main([out, "--sitemaps", sm, "--feeds", fd,
                   "--robots", rb, "--visited", vs])
    txt = capsys.readouterr().out
    assert rc == 0
    assert "stage=sitemaps urls=60 errors=1" in txt
    assert "stage=feeds urls=15 errors=0" in txt
    # 60 ∪ 15 → 70 distinct (5 overlap), minus 5 visited
    assert "stage=dedup candidates=70 new=65" in txt
    # h2's 10 /private/ urls blocked
    assert "stage=robots admitted=55 blocked=10" in txt
    assert "stage=frontier urls=55 hosts=3" in txt

    f = spark.read.parquet(f"{out}/frontier")
    # crawl-delay honored: h1 slots step by 2000 ms, h0 by 1000
    r = {(row["host"], row["fetch_seq"]): row["not_before_millis"]
         for row in f.collect()}
    assert r[("h1.example", 2)] == 2000
    assert r[("h0.example", 2)] == 1000
    # sitemap wins the provenance tiebreak on overlapping urls
    src = {row["url"]: row["source"] for row in f.collect()}
    assert src["https://h0.example/a/6"] == "feed" or \
        src["https://h0.example/a/6"] == "sitemap"
    assert src["https://h0.example/feed-only/3"] == "feed"

    # refusal paths: no inputs at all
    assert cli.main([str(tmp_path / "o2")]) == 1
