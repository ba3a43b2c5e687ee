"""URL canonicalization, registrable-domain extraction, and HTML text
processing — the crawl-side record transforms that sit between WARC
ingestion (sources/warc.py) and the quality/dedup funnel.

Reference parity: the reference ships URL/text munging as per-record
Mapper logic (src/examples/org/apache/hadoop/examples/Grep.java-style
regex maps and contrib/index's document preprocessing); here every
transform is a JVM column expression so a 100 TB crawl normalization
pass stays inside whole-stage codegen — no Python in the plan, filters
and projections push down to the parquet scan.

Heuristics follow the public C4 (Raffel et al. 2020) and CCNet
(Wenzek et al. 2020) crawl-cleaning recipes: canonical URLs for
URL-level dedup, registrable domains for per-site quotas, tag/script
stripping for text extraction.

Everything here is deliberately regex-expressible so the DuckDB
oracles replay the identical chain (Java regex and RE2 agree on the
subset used: no backrefs, no lookaround).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ------------------------------------------------------------------ URLs

# Multi-label public suffixes recognized by the two-rule heuristic.
# A production pipeline broadcasts the full Public Suffix List as a
# ~10k-row relation and longest-suffix-joins it (still cheap: the host
# side explodes to <= 4 candidate suffixes/row, the PSL side
# broadcasts); this literal subset keeps the transform join-free and
# fully codegen'd, which is the right trade until per-country suffix
# fidelity matters.
MULTI_LABEL_SUFFIXES: tuple[str, ...] = (
    "co.uk", "ac.uk", "gov.uk", "co.jp", "com.au", "com.br", "co.in",
)


def split_url(url: Column | str) -> tuple[Column, Column, Column]:
    """(scheme, hostport, path_query) — fragment is dropped by the
    capture itself ([^#]*)."""
    u = F.col(url) if isinstance(url, str) else url
    rx = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^#]*)"
    return (
        F.regexp_extract(u, rx, 1),
        F.regexp_extract(u, rx, 2),
        F.regexp_extract(u, rx, 3),
    )


def normalize_url(url: Column | str) -> Column:
    """Canonical URL for URL-level dedup: scheme and host lowercased,
    default port stripped (http:80 / https:443), fragment dropped,
    empty path -> '/', trailing lone '?' dropped. The path/query byte
    content is preserved (percent-escapes and case are significant
    there).
    """
    scheme, hostport, rest = split_url(url)
    scheme = F.lower(scheme)
    host = F.lower(hostport)
    host = F.when(
        (scheme == "http") & host.endswith(":80"),
        F.regexp_replace(host, ":80$", ""),
    ).when(
        (scheme == "https") & host.endswith(":443"),
        F.regexp_replace(host, ":443$", ""),
    ).otherwise(host)
    rest = F.regexp_replace(rest, r"\?$", "")
    rest = F.when(rest == "", F.lit("/")).otherwise(rest)
    return F.concat(scheme, F.lit("://"), host, rest)


def normalize_url_sql(expr: str) -> str:
    """DuckDB twin of normalize_url over SQL expression `expr`."""
    rx = "'^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^#]*)'"
    scheme = f"lower(regexp_extract({expr}, {rx}, 1))"
    host = f"lower(regexp_extract({expr}, {rx}, 2))"
    rest = f"regexp_replace(regexp_extract({expr}, {rx}, 3), '\\?$', '')"
    host_n = (
        f"CASE WHEN {scheme} = 'http' AND {host} LIKE '%:80' "
        f"THEN regexp_replace({host}, ':80$', '') "
        f"WHEN {scheme} = 'https' AND {host} LIKE '%:443' "
        f"THEN regexp_replace({host}, ':443$', '') ELSE {host} END"
    )
    rest_n = f"CASE WHEN {rest} = '' THEN '/' ELSE {rest} END"
    return f"({scheme} || '://' || {host_n} || {rest_n})"


def registrable_domain(host: Column | str) -> Column:
    """eTLD+1 under the two-rule heuristic: hosts ending in a known
    multi-label suffix keep their last THREE labels, everything else
    its last TWO. See MULTI_LABEL_SUFFIXES for the full-PSL scale note.
    """
    h = F.lower(F.col(host) if isinstance(host, str) else host)
    three = F.regexp_extract(h, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    two = F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)
    cond = None
    for suf in MULTI_LABEL_SUFFIXES:
        c = h.endswith("." + suf)
        cond = c if cond is None else (cond | c)
    # dot-less hosts (localhost, bare intranet names) have no eTLD+1;
    # fall through to the host itself.
    return F.when(cond, three).otherwise(
        F.when(two == "", h).otherwise(two)
    )


def registrable_domain_sql(expr: str) -> str:
    """DuckDB twin of registrable_domain."""
    h = f"lower({expr})"
    likes = " OR ".join(f"{h} LIKE '%.{s}'" for s in MULTI_LABEL_SUFFIXES)
    three = f"regexp_extract({h}, '([^.]+\\.[^.]+\\.[^.]+)$', 1)"
    two = f"regexp_extract({h}, '([^.]+\\.[^.]+)$', 1)"
    return (
        f"(CASE WHEN {likes} THEN {three} "
        f"WHEN {two} = '' THEN {h} ELSE {two} END)"
    )


# ------------------------------------------------------------------ HTML

# Ordered (pattern, replacement) chain. Order is load-bearing:
# script/style/comment blocks go first (their CONTENT must not leak
# into the text), tags second, entities decoded AFTER tag removal so
# a literal &lt;b&gt; in the source cannot resurrect a tag, &amp;
# decoded LAST (standard double-escape rule), whitespace collapsed at
# the end. (?is) = DOTALL + case-insensitive, identical semantics in
# Java regex and RE2.
_HTML_CHAIN: tuple[tuple[str, str], ...] = (
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]+>", " "),
    (r"&nbsp;", " "),
    (r"&quot;", '"'),
    (r"&#39;", "'"),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&amp;", "&"),
    (r"\s+", " "),
)


def strip_html(html: Column | str) -> Column:
    """Visible text of an HTML blob: script/style/comment blocks
    removed, tags replaced by spaces, the five standard entities
    decoded, whitespace collapsed, trimmed. One fused projection —
    Catalyst chains the regexp_replace calls inside a single codegen
    stage, so this is scan-bound at any scale."""
    c = F.col(html) if isinstance(html, str) else html
    for pat, repl in _HTML_CHAIN:
        c = F.regexp_replace(c, pat, repl)
    return F.trim(c)


def strip_html_sql(expr: str) -> str:
    """DuckDB twin of strip_html (RE2 'g'/'s'/'i' flags)."""
    c = expr
    for pat, repl in _HTML_CHAIN:
        flags = "g"
        if pat.startswith("(?is)"):
            pat, flags = pat[5:], "gis"
        elif pat.startswith("(?s)"):
            pat, flags = pat[4:], "gs"
        # DuckDB plain string literals keep backslashes as-is — only
        # quotes need escaping (doubling backslashes would turn \s+
        # into a literal-backslash pattern).
        p = pat.replace("'", "''")
        r = repl.replace("'", "''")
        c = f"regexp_replace({c}, '{p}', '{r}', '{flags}')"
    return f"trim({c})"


_HREF_RX = r'(?i)href="([^"]+)"'


def extract_links(html: Column | str) -> Column:
    """array<string> of href attribute values (double-quoted form)."""
    c = F.col(html) if isinstance(html, str) else html
    return F.regexp_extract_all(c, F.lit(_HREF_RX), 1)


def extract_links_sql(expr: str) -> str:
    return f"regexp_extract_all({expr}, 'href=\"([^\"]+)\"', 1, 'i')"


def host_of(url: Column | str) -> Column:
    """lowercased host of an absolute URL ('' for relative links)."""
    u = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)", 1))


def host_of_sql(expr: str) -> str:
    return (
        f"lower(regexp_extract({expr}, "
        f"'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1))"
    )


_ANCHOR_RX = r'(?is)<a\s[^>]*href="([^"]*)"[^>]*>(.*?)</a>'


def extract_anchor_tags(html: Column | str) -> Column:
    """array<string> of whole <a href="...">...</a> tags; callers pull
    href (group 1) / anchor text (group 2) with anchor_href /
    anchor_text per element — keeping the exploded row a plain string
    so downstream stays scalar-friendly."""
    c = F.col(html) if isinstance(html, str) else html
    return F.regexp_extract_all(c, F.lit(_ANCHOR_RX), 0)


def anchor_href(tag: Column) -> Column:
    return F.regexp_extract(tag, _ANCHOR_RX, 1)


def anchor_text(tag: Column) -> Column:
    return F.regexp_extract(tag, _ANCHOR_RX, 2)


def extract_anchor_tags_sql(expr: str) -> str:
    return (
        f"regexp_extract_all({expr}, "
        f"'(?is)<a\\s[^>]*href=\"([^\"]*)\"[^>]*>(.*?)</a>', 0)"
    )


def anchor_href_sql(expr: str) -> str:
    return (
        f"regexp_extract({expr}, "
        f"'(?is)<a\\s[^>]*href=\"([^\"]*)\"[^>]*>(.*?)</a>', 1)"
    )


def anchor_text_sql(expr: str) -> str:
    return (
        f"regexp_extract({expr}, "
        f"'(?is)<a\\s[^>]*href=\"([^\"]*)\"[^>]*>(.*?)</a>', 2)"
    )


def registrable_domain_psl(
    df,
    id_col: str,
    host_col: str,
    suffixes,
    max_labels: int = 4,
):
    """Full-Public-Suffix-List registrable-domain extraction — the
    broadcast-join scale path the two-rule heuristic documents: each
    host contributes its last 1..max_labels label-suffixes as
    candidates (<= max_labels rows/host), the PSL relation (~10k rows
    in production; any relation with a `suffix` column here)
    broadcasts, and the LONGEST matching suffix wins per host
    (candidates of one host nest, so string length is the label-count
    order). registrable = winning suffix + one label:

    - pages.h1.github.io with PSL entry github.io -> h1.github.io
      (the private-registry fidelity the two-rule heuristic cannot
      express);
    - a host EQUAL to a public suffix has no registrable domain
      (NULL);
    - a host matching NO entry falls back to the PSL default '*' rule:
      its last label is the suffix, so registrable = last two labels.

    Returns df's (id_col, host_col) plus `domain` (nullable). Scale:
    one explode bounded by max_labels, one broadcast join, one
    groupBy(id) max — no shuffle wider than the host list itself.
    """
    h = F.lower(F.col(host_col))
    labels = F.split(h, r"\.")
    n = F.size(labels)
    cands = F.filter(
        F.array(*[
            F.when(
                n >= k,
                F.array_join(F.slice(labels, n - F.lit(k) + 1, k), "."),
            )
            for k in range(1, max_labels + 1)
        ]),
        lambda c: c.isNotNull(),
    )
    base = df.select(F.col(id_col), h.alias("_h"), cands.alias("_cands"))
    exploded = base.select(
        id_col, "_h", F.explode("_cands").alias("_cand")
    )
    matched = (
        exploded.join(
            F.broadcast(suffixes.select(F.col("suffix").alias("_cand"))),
            "_cand",
        )
        .groupBy(id_col)
        .agg(
            F.max(
                F.struct(
                    F.length("_cand").alias("l"), F.col("_cand").alias("s")
                )
            ).alias("_w")
        )
    )
    out = base.join(matched, id_col, "left").select(
        F.col(id_col),
        F.col("_h").alias(host_col),
        F.split("_h", r"\.").alias("_labels"),
        F.size(F.split("_h", r"\.")).alias("_n"),
        # matched suffix label count; default '*' rule -> 1 label
        F.when(
            F.col("_w").isNotNull(),
            F.size(F.split(F.col("_w.s"), r"\.")),
        ).otherwise(F.lit(1)).alias("_k"),
    )
    return out.select(
        id_col,
        host_col,
        F.when(
            F.col("_n") > F.col("_k"),
            F.array_join(
                F.slice(
                    "_labels", F.col("_n") - F.col("_k"), F.col("_k") + 1
                ),
                ".",
            ),
        ).alias("domain"),
    )


# --------------------------------------------------------------- robots.txt

# RFC 9309 §2.1-2.2: field names are case-insensitive and whitespace
# around the ':' is insignificant; servers commonly emit CRLF line
# endings. Blobs are normalized to LF first (_robots_normalized) and
# the field-name matches use (?i) + optional [ \t] so a CRLF-served or
# 'user-agent:*' robots.txt parses instead of failing OPEN with zero
# rules (ADVICE r6). Inline (?i)/(?s) flags work identically in Java
# regex (Spark) and RE2 (DuckDB), so the same constants feed both.
# Rule fields are line-start-anchored via (?m)^ — without it the
# case-insensitive 'Allow:' would also match the 'allow:' substring
# of every 'Disallow:' line. The section regex stays non-(?m) so its
# '$' alternative means end-of-blob, not end-of-line.
_ROBOTS_STAR_SECTION_RX = (
    r"(?si)(?:^|\n)User-agent[ \t]*:[ \t]*\*[ \t]*\n"
    r"(.*?)(\n\nUser-agent[ \t]*:|$)"
)
_ROBOTS_DISALLOW_RX = r"(?im)^[ \t]*Disallow[ \t]*:[ \t]*([^\n]*)"


def _robots_normalized(c: Column) -> Column:
    """CRLF/CR -> LF, so the LF-anchored section grammar applies."""
    return F.regexp_replace(c, r"\r\n?", "\n")


def _robots_normalized_sql(expr: str) -> str:
    # DuckDB plain string literals keep backslashes, so RE2 sees the
    # \r / \n escapes; the replacement uses an E'' literal for a real
    # LF byte.
    return f"regexp_replace({expr}, '\\r\\n?', E'\\n', 'g')"


def robots_disallow_prefixes(robots: Column | str) -> Column:
    """array<string> of Disallow path prefixes from the `User-agent: *`
    group of a robots.txt blob (the crawl-politeness subset every
    fetcher implements: group selection + prefix rules; wildcards,
    Allow-precedence, and crawl-delay are out of scope and documented
    so). Empty Disallow lines (allow-all) are dropped. Line endings
    and field-name case are normalized per RFC 9309."""
    c = F.col(robots) if isinstance(robots, str) else robots
    section = F.regexp_extract(
        _robots_normalized(c), _ROBOTS_STAR_SECTION_RX, 1
    )
    return F.filter(
        F.regexp_extract_all(section, F.lit(_ROBOTS_DISALLOW_RX), 1),
        lambda p: p != "",
    )


def robots_disallow_prefixes_sql(expr: str) -> str:
    sec = (
        f"regexp_extract({_robots_normalized_sql(expr)}, "
        f"'{_ROBOTS_STAR_SECTION_RX}', 1)"
    )
    return (
        f"list_filter(regexp_extract_all({sec}, "
        f"'{_ROBOTS_DISALLOW_RX}', 1), p -> p <> '')"
    )


def url_allowed(path: Column | str, prefixes: Column) -> Column:
    """False when any Disallow prefix matches the URL path."""
    p = F.col(path) if isinstance(path, str) else path
    return ~F.exists(prefixes, lambda pre: p.startswith(pre))


def url_allowed_sql(path_expr: str, prefixes_expr: str) -> str:
    return (
        f"(NOT len(list_filter({prefixes_expr}, "
        f"p -> starts_with({path_expr}, p))) > 0)"
    )


# Full Robots Exclusion Protocol (RFC 9309) rule tier: Allow lines,
# '*' wildcards, '$' end anchor, longest-match-wins with Allow
# breaking ties. The prefix tier above stays as the cheap scan-local
# path; this tier is the standards-correct one.
_ROBOTS_ALLOW_RX = r"(?im)^[ \t]*Allow[ \t]*:[ \t]*([^\n]*)"


def robots_rep_rules(robots: Column | str) -> Column:
    """array<struct<allow int, pattern string>> — every Allow and
    Disallow rule of the `User-agent: *` group, empty patterns
    dropped (an empty Disallow means allow-all, i.e. no rule). Line
    endings and field-name case are normalized per RFC 9309."""
    c = F.col(robots) if isinstance(robots, str) else robots
    section = F.regexp_extract(
        _robots_normalized(c), _ROBOTS_STAR_SECTION_RX, 1
    )
    allows = F.filter(
        F.regexp_extract_all(section, F.lit(_ROBOTS_ALLOW_RX), 1),
        lambda p: p != "",
    )
    dis = F.filter(
        F.regexp_extract_all(section, F.lit(_ROBOTS_DISALLOW_RX), 1),
        lambda p: p != "",
    )
    return F.concat(
        F.transform(
            allows,
            lambda p: F.struct(F.lit(1).alias("allow"), p.alias("pattern")),
        ),
        F.transform(
            dis,
            lambda p: F.struct(F.lit(0).alias("allow"), p.alias("pattern")),
        ),
    )


def _rep_like_pattern(pat: Column) -> Column:
    """REP pattern -> SQL LIKE pattern (ESCAPE '~'): literal ~ % _
    escaped, '*' -> '%', trailing '$' anchors (no trailing '%'); a
    mid-pattern '$' is literal per the RFC's effective grammar."""
    esc = F.replace(
        F.replace(
            F.replace(pat, F.lit("~"), F.lit("~~")),
            F.lit("%"),
            F.lit("~%"),
        ),
        F.lit("_"),
        F.lit("~_"),
    )
    wild = F.replace(esc, F.lit("*"), F.lit("%"))
    anchored = pat.endswith("$")
    return F.when(
        anchored, wild.substr(F.lit(1), F.length(wild) - 1)
    ).otherwise(F.concat(wild, F.lit("%")))


def robots_rep_allowed(
    df: DataFrame,
    id_col: str,
    path_col: str,
    robots_col: str,
) -> DataFrame:
    """RFC 9309 URL gate: for each row's (path, robots blob), evaluate
    every star-group rule with wildcard/'$' semantics and apply
    longest-pattern-wins, Allow-beats-Disallow-on-ties precedence.
    No matching rule means allowed.

    Scale shape: rules explode multiplies rows by the per-host rule
    count (robots files are ~10 rules — a bounded constant, not a
    data-dependent blowup); the winner election is a partial-agg
    max(struct(pattern_len, allow)) on the row key, and non-matching
    rows come back via one left join. Wildcard matching itself is the
    JVM LIKE kernel — no regex compilation per row, no Python.

    Output: df columns + `allowed` (int 0/1).
    """
    rules = robots_rep_rules(F.col(robots_col))
    exploded = df.select(
        F.col(id_col), F.col(path_col), F.explode(rules).alias("_r")
    ).select(
        id_col,
        path_col,
        F.col("_r.allow").alias("_allow"),
        F.col("_r.pattern").alias("_pat"),
    )
    matched = exploded.withColumn(
        "_likepat", _rep_like_pattern(F.col("_pat"))
    ).where(F.expr(f"{path_col} LIKE _likepat ESCAPE '~'"))
    winners = matched.groupBy(id_col).agg(
        F.max(
            F.struct(
                F.length("_pat").alias("l"), F.col("_allow").alias("a")
            )
        ).alias("_w")
    )
    return df.join(winners, id_col, "left").select(
        *df.columns,
        F.coalesce(F.col("_w.a"), F.lit(1)).cast("int").alias("allowed"),
    )


def robots_rep_allowed_sql(
    path_expr: str, robots_expr: str, id_expr: str = "doc_id"
) -> str:
    """DuckDB CTE block body replicating robots_rep_allowed for one
    relation `u` with columns (doc_id, path, robots); yields
    (doc_id, allowed). Compose as: WITH u AS (...), {this} SELECT ..."""
    sec = (
        f"regexp_extract({_robots_normalized_sql(robots_expr)}, "
        f"'{_ROBOTS_STAR_SECTION_RX}', 1)"
    )
    mk = (
        "list_concat("
        f"list_transform(list_filter(regexp_extract_all({sec}, "
        f"'{_ROBOTS_ALLOW_RX}', 1), p -> p <> ''), "
        "p -> struct_pack(allow := 1, pattern := p)), "
        f"list_transform(list_filter(regexp_extract_all({sec}, "
        f"'{_ROBOTS_DISALLOW_RX}', 1), p -> p <> ''), "
        "p -> struct_pack(allow := 0, pattern := p)))"
    )
    return f"""
    rules AS (
      SELECT {id_expr} AS doc_id, {path_expr} AS path,
             unnest({mk}) AS r
      FROM u
    ),
    likepats AS (
      SELECT doc_id, path, r.allow AS allow, r.pattern AS pattern,
             CASE WHEN pattern LIKE '%$'
                  THEN substr(wild, 1, length(wild) - 1)
                  ELSE wild || '%' END AS likepat
      FROM (
        SELECT *, replace(replace(replace(replace(r.pattern,
                 '~', '~~'), '%', '~%'), '_', '~_'), '*', '%') AS wild
        FROM rules
      )
    ),
    winners AS (
      SELECT doc_id, allow,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY length(pattern) DESC,
                                         allow DESC) AS rn
      FROM likepats WHERE path LIKE likepat ESCAPE '~'
    ),
    gated AS (
      SELECT u.doc_id,
             CAST(coalesce(w.allow, 1) AS INT) AS allowed
      FROM u LEFT JOIN (SELECT doc_id, allow FROM winners WHERE rn = 1) w
             ON u.doc_id = w.doc_id
    )
    """
