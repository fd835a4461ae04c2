"""URL / web-crawl curation operators (north-star LLM-data lane,
r12).

Every crawled document arrives with a URL, and corpus curation leans
on it hard: tracking-parameter stripping and canonicalization (the
same article arrives under hundreds of `utm_*` variants), dedup by
canonical URL (cheaper and earlier than any content hash),
registrable-domain extraction (quota caps, licensing, blocklists),
and per-domain corpus accounting. All pure Column expressions —
`parse_url` (JVM-side) plus regexp/array functions — zero UDFs, scan
shape until the one groupBy(url_canon)/groupBy(domain) re-aggregate.

The synthetic corpus has no URL column, so (the repo's fixture
convention — `_pii_augmented`, `_html_wrapped`) a deterministic
doc_id-keyed URL is synthesized first: a third of docs share an
"article key" (ak = doc_id % 30) while carrying doc-specific
tracking params, planting exactly the real-world duplicate shape —
same canonical URL, different raw URLs. Single source of truth per
step: each Spark chain has a same-shape DuckDB SQL builder.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: the five synthetic registrable domains; index = ak % 5. One
#: two-label public suffix (co.uk) so registrable-domain extraction
#: has a non-trivial case.
_DOMAINS = (
    "example.com",
    "news.example.co.uk",
    "sample.org",
    "media.example.net",
    "docs.sample.org",
)

#: query parameters canonicalization strips (tracking/session junk).
_TRACKING_RE = r"^(utm_[^=]*|ref|fbclid|gclid)="

#: public suffixes that take TWO labels (mini public-suffix list —
#: a real deployment loads the full PSL as a broadcast table; the
#: extraction logic is identical).
_TWO_LABEL_SUFFIXES = ("co.uk",)


def _ak() -> Column:
    """The article key: a third of docs collapse onto 30 shared
    articles (the planted canonical-duplicate groups)."""
    return F.when(
        F.col("doc_id") % 3 == 0, F.col("doc_id") % 30
    ).otherwise(F.col("doc_id"))


_AK_SQL = "CASE WHEN doc_id % 3 = 0 THEN doc_id % 30 ELSE doc_id END"


def _url_col() -> Column:
    """The synthetic raw URL: scheme/host/port keyed by the article
    key (so duplicates agree on them), tracking params and fragment
    keyed by doc_id (so raw URLs differ), an UPPERCASE-host variant
    (%9) and an explicit default :443 (%13) planting the
    case-folding and default-port canonicalization work.
    :func:`_url_sql` is the DuckDB twin."""
    ak = _ak()
    aks = ak.cast("string")
    scheme = F.when(ak % 5 == 0, F.lit("http")).otherwise(F.lit("https"))
    domain = F.element_at(
        F.array(*[F.lit(d) for d in _DOMAINS]), (ak % 5 + 1).cast("int")
    )
    host = F.concat(
        F.when(ak % 4 == 0, F.lit("www.")).otherwise(F.lit("")), domain
    )
    host = F.when(F.col("doc_id") % 9 == 0, F.upper(host)).otherwise(host)
    port = F.when(ak % 11 == 0, F.lit(":8080")).otherwise(
        F.when((F.col("doc_id") % 13 == 0) & (ak % 5 != 0), F.lit(":443"))
        .otherwise(F.lit(""))
    )
    path = F.concat(
        F.lit("/a"), (ak % 7).cast("string"), F.lit("/item-"), aks
    )
    tracking = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(
            F.lit("&utm_source=feed&utm_campaign=c"),
            (F.col("doc_id") % 5).cast("string"),
        ),
    ).otherwise(
        # some odd docs arrive CLEAN so was_canonical discriminates
        F.when(F.col("doc_id") % 5 < 3, F.lit("&ref=tw")).otherwise(
            F.lit("")
        )
    )
    query = F.concat(F.lit("?id="), aks, tracking)
    frag = F.when(
        F.col("doc_id") % 6 == 0,
        F.concat(F.lit("#sec"), (F.col("doc_id") % 2).cast("string")),
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port, path, query, frag)


def _url_sql() -> str:
    pool = ", ".join(f"'{d}'" for d in _DOMAINS)
    return f"""(
  CASE WHEN ({_AK_SQL}) % 5 = 0 THEN 'http' ELSE 'https' END || '://'
  || CASE WHEN doc_id % 9 = 0 THEN upper(
       (CASE WHEN ({_AK_SQL}) % 4 = 0 THEN 'www.' ELSE '' END)
       || list_extract([{pool}], CAST(({_AK_SQL}) % 5 + 1 AS INT)))
     ELSE
       (CASE WHEN ({_AK_SQL}) % 4 = 0 THEN 'www.' ELSE '' END)
       || list_extract([{pool}], CAST(({_AK_SQL}) % 5 + 1 AS INT))
     END
  || CASE WHEN ({_AK_SQL}) % 11 = 0 THEN ':8080'
          WHEN doc_id % 13 = 0 AND ({_AK_SQL}) % 5 <> 0 THEN ':443'
          ELSE '' END
  || '/a' || CAST(({_AK_SQL}) % 7 AS VARCHAR)
  || '/item-' || CAST({_AK_SQL} AS VARCHAR)
  || '?id=' || CAST({_AK_SQL} AS VARCHAR)
  || CASE WHEN doc_id % 2 = 0
          THEN '&utm_source=feed&utm_campaign=c'
               || CAST(doc_id % 5 AS VARCHAR)
          WHEN doc_id % 5 < 3 THEN '&ref=tw'
          ELSE '' END
  || CASE WHEN doc_id % 6 = 0
          THEN '#sec' || CAST(doc_id % 2 AS VARCHAR) ELSE '' END
)"""


def url_parse(docs: DataFrame) -> DataFrame:
    """Structural URL parse: scheme/host/port/path/query/fragment.
    Spark side uses the JVM ``parse_url`` (Hive/Java URI semantics);
    the twin re-derives the same fields with one anchored regexp per
    part — agreement on the synthesized corpus pins that the two
    readings coincide on well-formed URLs."""
    u = _url_col()
    return docs.select(
        "doc_id",
        u.alias("url"),
        F.parse_url(u, F.lit("PROTOCOL")).alias("scheme"),
        F.parse_url(u, F.lit("HOST")).alias("host"),
        F.nullif(
            F.regexp_extract(u, r"^[a-z]+://[^/:?#]+:([0-9]+)", 1),
            F.lit(""),
        ).cast("bigint").alias("port"),
        F.parse_url(u, F.lit("PATH")).alias("path"),
        F.coalesce(F.parse_url(u, F.lit("QUERY")), F.lit("")).alias(
            "query"
        ),
        F.coalesce(F.parse_url(u, F.lit("REF")), F.lit("")).alias(
            "fragment"
        ),
    )


def url_parse_sql() -> str:
    u = _url_sql()
    return f"""
WITH raw AS (SELECT doc_id, {u} AS url FROM documents)
SELECT doc_id, url,
       regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
       regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1) AS host,
       CAST(NULLIF(regexp_extract(url, '^[a-z]+://[^/:?#]+:([0-9]+)', 1),
                   '') AS BIGINT) AS port,
       regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
       COALESCE(NULLIF(regexp_extract(url, '\\?([^#]*)', 1), ''),
                '') AS query,
       COALESCE(NULLIF(regexp_extract(url, '#(.*)$', 1), ''),
                '') AS fragment
FROM raw
"""


def _canon_col(u: Column) -> Column:
    """Canonical URL from a raw URL Column: lowercase scheme+host,
    drop default ports (:80 http / :443 https), drop the fragment,
    strip tracking params, SORT the survivors (param order is not
    identity), rejoin. Everything is array/regexp expressions."""
    scheme = F.lower(F.parse_url(u, F.lit("PROTOCOL")))
    host = F.lower(F.parse_url(u, F.lit("HOST")))
    port = F.nullif(
        F.regexp_extract(u, r"^[a-zA-Z]+://[^/:?#]+:([0-9]+)", 1),
        F.lit(""),
    )
    keep_port = F.when(
        port.isNull()
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit(""))
    query = F.coalesce(F.parse_url(u, F.lit("QUERY")), F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    canon_q = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme, F.lit("://"), host, keep_port, path,
        F.when(canon_q == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), canon_q)
        ),
    )


def _canon_sql(url_expr: str) -> str:
    """DuckDB twin of :func:`_canon_col` over ``url_expr``."""
    scheme = f"lower(regexp_extract({url_expr}, '^([a-zA-Z]+)://', 1))"
    host = f"lower(regexp_extract({url_expr}, '^[a-zA-Z]+://([^/:?#]+)', 1))"
    port = (
        f"NULLIF(regexp_extract({url_expr},"
        f" '^[a-zA-Z]+://[^/:?#]+:([0-9]+)', 1), '')"
    )
    keep_port = (
        f"CASE WHEN {port} IS NULL"
        f" OR ({scheme} = 'http' AND {port} = '80')"
        f" OR ({scheme} = 'https' AND {port} = '443')"
        f" THEN '' ELSE ':' || {port} END"
    )
    path = (
        f"COALESCE(regexp_extract({url_expr}, '^[a-zA-Z]+://[^/?#]+(/[^?#]*)',"
        f" 1), '')"
    )
    query = (
        f"COALESCE(NULLIF(regexp_extract({url_expr}, '\\?([^#]*)', 1), ''),"
        f" '')"
    )
    # COALESCE: array_to_string([]) is NULL in DuckDB (the html-lane
    # trap) — a URL whose every param is tracking would otherwise
    # NULL-poison the whole concat (caught by the crafted-case
    # pytest; the corpus gate can't see it because every synthetic
    # URL keeps its id= param)
    canon_q = (
        f"COALESCE(array_to_string(list_sort(list_filter("
        f"string_split({query}, '&'),"
        f" p -> p <> '' AND NOT regexp_matches(p, '{_TRACKING_RE}'))),"
        f" '&'), '')"
    )
    return (
        f"{scheme} || '://' || {host} || {keep_port} || {path}"
        f" || CASE WHEN {canon_q} = '' THEN ''"
        f" ELSE '?' || {canon_q} END"
    )


def url_canonicalize(docs: DataFrame) -> DataFrame:
    """Raw -> canonical URL per doc (see :func:`_canon_col`), plus
    the is-already-canonical flag (the measured share of clean
    URLs)."""
    u = _url_col()
    canon = _canon_col(u)
    return docs.select(
        "doc_id",
        u.alias("url"),
        canon.alias("url_canon"),
        (u == canon).alias("was_canonical"),
    )


def url_canonicalize_sql() -> str:
    u = _url_sql()
    canon = _canon_sql("url")
    return f"""
WITH raw AS (SELECT doc_id, {u} AS url FROM documents)
SELECT doc_id, url, {canon} AS url_canon,
       (url = {canon}) AS was_canonical
FROM raw
"""


def registrable_domain(docs: DataFrame) -> DataFrame:
    """Host -> registrable domain (eTLD+1) under the mini suffix
    list: two-label public suffixes take three labels, everything
    else two. This is the no-data FALLBACK; :func:`psl_registrable` /
    :func:`registrable_domain_psl` resolve through the checked-in
    full-format PSL snapshot (broadcast rule join, wildcard and
    exception rules) and are what a deployment should use."""
    u = _url_col()
    host = F.lower(F.parse_url(u, F.lit("HOST")))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    two_label = F.lit(False)
    for suf in _TWO_LABEL_SUFFIXES:
        two_label = two_label | host.endswith("." + suf) | (host == suf)
    # Clamp the slice start to 1 (Spark rejects start=0 at runtime):
    # a host that IS a suffix (host == 'co.uk', n == 2) would otherwise
    # crash here while the DuckDB twin's greatest(len(ls)-2, 1) guard
    # returns the whole host — mirror that guard.
    dom = F.when(
        two_label,
        F.array_join(F.slice(labels, F.greatest(n - 2, F.lit(1)), 3), "."),
    ).otherwise(
        F.array_join(F.slice(labels, F.greatest(n - 1, F.lit(1)), 2), ".")
    )
    return docs.select(
        "doc_id", host.alias("host"), dom.alias("domain")
    )


def registrable_domain_sql() -> str:
    u = _url_sql()
    host = "lower(regexp_extract(url, '^[a-zA-Z]+://([^/:?#]+)', 1))"
    conds = " OR ".join(
        f"h LIKE '%.{suf}' OR h = '{suf}'" for suf in _TWO_LABEL_SUFFIXES
    )
    return f"""
WITH raw AS (SELECT doc_id, {u} AS url FROM documents),
hosts AS (SELECT doc_id, {host} AS h FROM raw),
parts AS (SELECT doc_id, h, string_split(h, '.') AS ls FROM hosts)
SELECT doc_id, h AS host,
       CASE WHEN {conds}
            THEN array_to_string(ls[greatest(len(ls) - 2, 1):len(ls)], '.')
            ELSE array_to_string(ls[greatest(len(ls) - 1, 1):len(ls)], '.')
       END AS domain
FROM parts
"""


# ---------------------------------------------------------------------------
# Full public-suffix-list registrable domain (r13, VERDICT r12 ask
# #4). The mini two-label list above stays as the no-data fallback;
# this is the real thing: a checked-in PSL snapshot
# (data/public_suffix_list.dat — a curated subset covering every rule
# class; deployments drop in the full upstream file) loaded once,
# broadcast-joined against the host's label suffixes, prevailing rule
# chosen per the publicsuffix.org algorithm (exception rules win,
# else most labels; unlisted TLDs fall to the implicit '*' rule).

import os as _os

_PSL_PATH = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "data",
    "public_suffix_list.dat",
)


def psl_rules(path: str | None = None) -> list[tuple[str, int, int, int]]:
    """Parse a publicsuffix.org-format file into match tuples
    ``(key, match_len, prio, rule_labels)``:

    - normal rule ``a.b``   -> key ``a.b``, match_len = its labels,
      prio 0, rule_labels = its labels;
    - wildcard ``*.b``      -> key ``b``, match_len = b's labels
      (the candidate that must EQUAL b; the host must have at least
      one more label, checked at join time), prio 0, rule_labels =
      b's labels + 1;
    - exception ``!e.b``    -> key ``e.b``, prio 1, rule_labels = its
      labels (the public suffix it selects is rule_labels - 1).

    The prevailing rule reduces to ``max(prio * 100 + rule_labels)``
    and the public-suffix label count to ``rule_labels - prio`` —
    within a priority tier, equal rule_labels always yield the same
    suffix length, so a plain integer MAX is tie-safe (no struct /
    arg_max ordering to diverge between engines).
    """
    rules = []
    with open(path or _PSL_PATH, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip().lower()
            if not line or line.startswith("//"):
                continue
            # the PSL format reads each line only up to the first
            # whitespace (trailing annotations are legal) — keeping
            # the whole line would mint a garbage key that silently
            # never matches
            line = line.split()[0]
            if line.startswith("!"):
                body = line[1:]
                n = body.count(".") + 1
                rules.append((body, n, 1, n))
            elif line.startswith("*."):
                body = line[2:]
                n = body.count(".") + 1
                rules.append((body, n, 0, n + 1))
            else:
                n = line.count(".") + 1
                rules.append((line, n, 0, n))
    # The prevailing-rule reduction packs (prio, rule_labels) as
    # prio*100 + rule_labels and decodes with %100 — sound only while
    # every rule has < 100 labels (the real PSL's max is ~5). A
    # malformed or hostile file would otherwise mis-resolve domains
    # SILENTLY instead of erroring, so the invariant is enforced at
    # load time.
    for key, _, _, rl in rules:
        if rl >= 100:
            raise ValueError(
                f"PSL rule '{key}' has {rl} labels; the prio*100 "
                "packing supports at most 99 (real PSL max is ~5) — "
                "refusing a malformed suffix list"
            )
        # keys flow into generated SQL literals and the deployment
        # CSV: characters that could break either representation
        # (quotes, commas, backslashes, control chars) never occur in
        # a legitimate suffix list (IDN labels are unicode LETTERS) —
        # refuse rather than splice
        if any(ch in key for ch in "',\"\\\x00") or any(
            ord(ch) < 0x20 for ch in key
        ):
            raise ValueError(
                f"PSL rule {key!r} contains quoting/control "
                "characters — refusing a malformed suffix list"
            )
    return rules


def psl_registrable(
    hosts: DataFrame,
    host_col: str = "host",
    rules: list[tuple[str, int, int, int]] | None = None,
) -> DataFrame:
    """(id cols..., host) -> + ``public_suffix`` + ``domain``
    (registrable domain; NULL when the host IS a public suffix, per
    the PSL algorithm).

    Shape: explode the host's label suffixes (at most
    max-rule-match-len candidates per host, ~4), broadcast-join the
    rule table on (candidate, length), integer-MAX the prevailing
    rule per host, slice the label array. One narrow shuffle on the
    row key; the rule relation is a few thousand rows broadcast —
    the plan a 100 TB crawl wants.
    """
    rules = rules if rules is not None else psl_rules()
    maxr = max(m for _, m, _, _ in rules)
    spark = hosts.sparkSession
    psl = spark.createDataFrame(
        rules, "key string, match_len int, prio int, rule_labels int"
    )
    h = F.lower(F.col(host_col))
    labels = F.split(h, r"\.")
    n = F.size(labels)
    base = hosts.withColumn("_labels", labels).withColumn("_n", n)
    cands = base.select(
        F.col(host_col).alias("_h"),
        "_n",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.least(F.col("_n"), F.lit(maxr))),
                lambda i: F.struct(
                    i.alias("i"),
                    F.array_join(
                        F.slice(
                            F.col("_labels"),
                            F.col("_n") - i + 1,
                            i,
                        ),
                        ".",
                    ).alias("cand"),
                ),
            )
        ).alias("c"),
    ).select("_h", "_n", F.col("c.i").alias("i"), F.col("c.cand").alias("cand"))
    matched = (
        cands.join(
            F.broadcast(psl),
            (F.col("cand") == F.col("key")) & (F.col("i") == F.col("match_len")),
        )
        # a wildcard rule (rule_labels = match_len + 1) needs the '*'
        # to consume one real label: host must extend past the match
        .filter(
            (F.col("rule_labels") == F.col("match_len"))
            | (F.col("_n") > F.col("match_len"))
        )
        .groupBy("_h")
        .agg(F.max(F.col("prio") * 100 + F.col("rule_labels")).alias("_mk"))
    )
    out = base.join(matched, base[host_col] == matched["_h"], "left").drop("_h")
    # floor, not cast-of-division: prio 1 gives _mk in [100, 199] and
    # a rounding division would carry 1.99 -> 2 (the DuckDB twin uses
    # // for the same reason)
    ps_n = F.when(F.col("_mk").isNull(), F.lit(1)).otherwise(
        F.col("_mk") % 100 - F.floor(F.col("_mk") / 100)
    )
    out = out.withColumn("_ps_n", ps_n)
    public_suffix = F.when(
        F.col("_n") >= F.col("_ps_n"),
        F.array_join(
            F.slice(F.col("_labels"), F.col("_n") - F.col("_ps_n") + 1,
                    F.col("_ps_n")),
            ".",
        ),
    )
    domain = F.when(
        F.col("_n") > F.col("_ps_n"),
        F.array_join(
            F.slice(F.col("_labels"), F.col("_n") - F.col("_ps_n"),
                    F.col("_ps_n") + 1),
            ".",
        ),
    )
    return out.select(
        *[c for c in hosts.columns],
        public_suffix.alias("public_suffix"),
        domain.alias("domain"),
    )


def psl_values_sql(
    rules: list[tuple[str, int, int, int]] | None = None,
) -> str:
    """The rule table as a VALUES list (the oracle twin reads the
    SAME loaded snapshot — one source of truth)."""
    rules = rules if rules is not None else psl_rules()
    rows = ", ".join(
        f"('{k}', {m}, {p}, {r})" for k, m, p, r in rules
    )
    return (
        f"(SELECT * FROM (VALUES {rows})"
        f" t(key, match_len, prio, rule_labels))"
    )


def psl_rules_csv_write(
    path: str, rules: list[tuple[str, int, int, int]] | None = None
) -> str:
    """Materialize the parsed rule table as a CSV for the full-PSL
    deployment path: with the complete upstream file (~10k rules) the
    VALUES literal :func:`psl_values_sql` splices would balloon every
    generated query to hundreds of KB and be rebuilt per construction
    — registering the relation once (``read_csv``, or a temp table
    loaded from it) keeps the generated SQL constant-size. The
    checked-in snapshot stays on the VALUES form (self-contained
    oracle strings are the gate contract). Returns ``path``."""
    import csv

    rules = rules if rules is not None else psl_rules()
    # csv.writer (not string interpolation): psl_rules() refuses keys
    # carrying quoting characters, but belt-and-braces quoting keeps
    # this writer safe even for rule lists built programmatically
    with open(path, "w", encoding="utf-8", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(("key", "match_len", "prio", "rule_labels"))
        w.writerows(rules)
    return path


def psl_table_sql(csv_path: str) -> str:
    """A rules relation reading the CSV :func:`psl_rules_csv_write`
    wrote — drop-in for the ``rules_rel`` parameter of
    :func:`psl_registrable_sql`. Paths carrying a single quote are
    refused rather than spliced (the same refuse-not-escape policy
    the rule-key validation uses; advisor finding r14)."""
    if "'" in csv_path:
        raise ValueError(
            f"csv_path contains a single quote, refusing to splice"
            f" it into SQL: {csv_path!r}"
        )
    return (
        f"(SELECT key, CAST(match_len AS INT) AS match_len,"
        f" CAST(prio AS INT) AS prio,"
        f" CAST(rule_labels AS INT) AS rule_labels"
        f" FROM read_csv('{csv_path}', header=true))"
    )


def psl_registrable_sql(
    hosts_sql: str,
    host_col: str = "host",
    rules: list[tuple[str, int, int, int]] | None = None,
    rules_rel: str | None = None,
    max_match_len: int | None = None,
) -> str:
    """DuckDB twin of :func:`psl_registrable` over ``hosts_sql`` (a
    subquery producing the host relation). ``rules_rel`` (with
    ``max_match_len``) swaps the inlined VALUES literal for a
    registered relation — the full-PSL deployment path (see
    :func:`psl_rules_csv_write`)."""
    if rules_rel is not None:
        if max_match_len is None:
            raise ValueError("rules_rel requires max_match_len")
        maxr = max_match_len
        rel = rules_rel
    else:
        rules = rules if rules is not None else psl_rules()
        maxr = max(m for _, m, _, _ in rules)
        rel = psl_values_sql(rules)
    return f"""
WITH hostsrc AS MATERIALIZED ({hosts_sql}),
parts AS (
  SELECT *, string_split(lower({host_col}), '.') AS _labels,
         len(string_split(lower({host_col}), '.')) AS _n
  FROM hostsrc
),
cand0 AS (
  SELECT {host_col} AS _h, _n, _labels,
         unnest(generate_series(1, least(_n, {maxr}))) AS i
  FROM parts
),
cands AS (
  SELECT _h, _n, i,
         array_to_string(_labels[_n - i + 1 : _n], '.') AS cand
  FROM cand0
),
matched AS (
  SELECT _h, MAX(prio * 100 + rule_labels) AS _mk
  FROM cands JOIN {rel} r
    ON cands.cand = r.key AND cands.i = r.match_len
  WHERE r.rule_labels = r.match_len OR cands._n > r.match_len
  GROUP BY _h
),
fin AS (
  -- // (floor division), never CAST(x / 100 AS INT): prio 1 gives
  -- _mk in [100, 199] and DuckDB's cast ROUNDS 1.99 up to 2
  SELECT p.*,
         CASE WHEN m._mk IS NULL THEN 1
              ELSE m._mk % 100 - m._mk // 100 END AS _ps_n
  FROM parts p LEFT JOIN matched m ON m._h = p.{host_col}
)
SELECT * EXCLUDE (_labels, _n, _ps_n),
       CASE WHEN _n >= _ps_n
            THEN array_to_string(_labels[_n - _ps_n + 1 : _n], '.')
       END AS public_suffix,
       CASE WHEN _n > _ps_n
            THEN array_to_string(_labels[_n - _ps_n : _n], '.')
       END AS domain
FROM fin
"""


def registrable_domain_psl(docs: DataFrame) -> DataFrame:
    """The gate wrapper: synthesize the fixture URL, extract the
    host, resolve public suffix + registrable domain through the
    checked-in PSL snapshot."""
    u = _url_col()
    hosts = docs.select(
        "doc_id", F.lower(F.parse_url(u, F.lit("HOST"))).alias("host")
    )
    return psl_registrable(hosts)


def registrable_domain_psl_sql() -> str:
    u = _url_sql()
    host = "lower(regexp_extract(url, '^[a-zA-Z]+://([^/:?#]+)', 1))"
    hosts_sql = (
        f"SELECT doc_id, {host} AS host FROM"
        f" (SELECT doc_id, {u} AS url FROM documents) raw"
    )
    return psl_registrable_sql(hosts_sql)


def url_dedup_canonical(docs: DataFrame) -> DataFrame:
    """Dedup by canonical URL — the cheapest dedup pass in the whole
    pipeline (no content reads at all): one groupBy(url_canon),
    survivor = min doc_id, per-doc verdict joined back. At 100 TB
    this is one shuffle on a short string key, run BEFORE any
    text-hash dedup so tracking-param mirror copies never reach the
    expensive passes."""
    canon = url_canonicalize(docs).select("doc_id", "url_canon")
    groups = canon.groupBy("url_canon").agg(
        F.min("doc_id").alias("keep_doc"),
        F.count(F.lit(1)).alias("n_dups"),
    )
    return canon.join(groups, "url_canon").select(
        "doc_id",
        "url_canon",
        (F.col("doc_id") == F.col("keep_doc")).alias("kept"),
        "n_dups",
    )


def url_dedup_canonical_sql() -> str:
    u = _url_sql()
    canon = _canon_sql("url")
    return f"""
WITH raw AS (SELECT doc_id, {u} AS url FROM documents),
canon AS (SELECT doc_id, {canon} AS url_canon FROM raw),
groups AS (
  SELECT url_canon, MIN(doc_id) AS keep_doc,
         CAST(COUNT(*) AS BIGINT) AS n_dups
  FROM canon GROUP BY url_canon
)
SELECT c.doc_id, c.url_canon,
       (c.doc_id = g.keep_doc) AS kept, g.n_dups
FROM canon c JOIN groups g USING (url_canon)
"""


def domain_stats(docs: DataFrame) -> DataFrame:
    """Per-registrable-domain corpus accounting: docs, distinct
    hosts, distinct canonical URLs, and the duplicate fraction —
    the inputs a source-quota / blocklist decision reads."""
    u = _url_col()
    host = F.lower(F.parse_url(u, F.lit("HOST")))
    dom = registrable_domain(docs).select("doc_id", "domain")
    canon = url_canonicalize(docs).select("doc_id", "url_canon")
    base = docs.select("doc_id", host.alias("host")).join(
        dom, "doc_id"
    ).join(canon, "doc_id")
    return base.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("host").alias("n_hosts"),
        F.count_distinct("url_canon").alias("n_canon"),
        (F.count(F.lit(1)) - F.count_distinct("url_canon")).alias(
            "n_dup_docs"
        ),
    )


def domain_stats_sql() -> str:
    u = _url_sql()
    canon = _canon_sql("url")
    host = "lower(regexp_extract(url, '^[a-zA-Z]+://([^/:?#]+)', 1))"
    conds = " OR ".join(
        f"h LIKE '%.{suf}' OR h = '{suf}'"
        for suf in _TWO_LABEL_SUFFIXES
    )
    return f"""
WITH raw AS (SELECT doc_id, {u} AS url FROM documents),
base AS (
  SELECT doc_id, {host} AS h, {canon} AS url_canon FROM raw
),
parts AS (SELECT doc_id, h, url_canon, string_split(h, '.') AS ls FROM base),
dom AS (
  SELECT doc_id, h, url_canon,
         CASE WHEN {conds}
              THEN array_to_string(ls[greatest(len(ls) - 2, 1):len(ls)], '.')
              ELSE array_to_string(ls[greatest(len(ls) - 1, 1):len(ls)], '.')
         END AS domain
  FROM parts
)
SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT h) AS BIGINT) AS n_hosts,
       CAST(COUNT(DISTINCT url_canon) AS BIGINT) AS n_canon,
       CAST(COUNT(*) - COUNT(DISTINCT url_canon) AS BIGINT) AS n_dup_docs
FROM dom GROUP BY domain
"""
