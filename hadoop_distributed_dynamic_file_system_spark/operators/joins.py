"""Join family: the join-expression language + N-way join builders.

Reference surfaces:
- Map-side composite join language `mapred.join.expr` with grammar
  ``op(source, source, ...)`` where op ∈ {inner, outer, override} and
  leaves are ``tbl(format, "path")`` — stack parser in
  src/mapred/org/apache/hadoop/mapred/join/Parser.java:65,140,454-487,
  compose() helpers in CompositeInputFormat.java:63-69,136-162.
- InnerJoinRecordReader.java:30,41 — emit iff ALL sources have the key.
- OuterJoinRecordReader.java:30,41 — full outer, absent slots empty.
- OverrideRecordReader.java:36,49 — value from the RIGHTMOST source
  that defines the key ("prefer newer source").
- Reduce-side tagged join (contrib/data_join/.../DataJoinReducerBase.
  java:129-181): union of tagged sources, group by key, cross-product
  across tags — subsumed by a plain relational join.

Spark-first: every composite compiles to chained equi-joins that
Catalyst plans (broadcast-hash for small sides, sort-merge otherwise;
AQE re-plans at runtime). The reference required identically-
partitioned pre-sorted inputs for its map-side join — Spark gets the
same no-shuffle plan from bucketed tables, and correctness never
depends on physical layout.

Semantics note: with duplicate keys, every variant emits the per-key
cross product across sources — the same as the reference's
ResetableIterator cross products.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import reduce
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ------------------------------------------------------------ expression AST
@dataclass
class Node:
    op: str  # 'inner' | 'outer' | 'override' | 'tbl'
    children: list["Node"] = field(default_factory=list)
    ident: str | None = None  # for tbl leaves: table name or path


_TOKEN_RE = re.compile(r'\s*(?:(?P<id>[A-Za-z_][\w.]*)|(?P<str>"[^"]*")|(?P<p>[(),]))')


def _tokenize(expr: str) -> list[str]:
    tokens, pos = [], 0
    while pos < len(expr):
        m = _TOKEN_RE.match(expr, pos)
        if not m:
            if expr[pos:].strip():
                raise ValueError(f"bad join expression at {expr[pos:]!r}")
            break
        tokens.append(m.group("id") or m.group("str") or m.group("p"))
        pos = m.end()
    return tokens


def parse_join_expr(expr: str) -> Node:
    """Recursive-descent parser for ``inner(tbl(...),outer(...),...)``.

    Accepts the reference grammar (Parser.java) with two Spark-era
    liberties: `tbl` takes (format, "path") OR a single bare table
    name, and bare identifiers are sugar for ``tbl(ident)``.
    """
    tokens = _tokenize(expr)
    pos = 0

    def peek() -> str | None:
        return tokens[pos] if pos < len(tokens) else None

    def eat(tok: str | None = None) -> str:
        nonlocal pos
        if pos >= len(tokens):
            raise ValueError("unexpected end of join expression")
        t = tokens[pos]
        if tok is not None and t != tok:
            raise ValueError(f"expected {tok!r}, got {t!r}")
        pos += 1
        return t

    def parse_node() -> Node:
        t = eat()
        if t in ("inner", "outer", "override"):
            eat("(")
            children = [parse_node()]
            while peek() == ",":
                eat(",")
                children.append(parse_node())
            eat(")")
            if len(children) < 2:
                raise ValueError(f"{t} needs >= 2 sources")
            return Node(op=t, children=children)
        if t == "tbl":
            eat("(")
            args = [eat()]
            while peek() == ",":
                eat(",")
                args.append(eat())
            eat(")")
            ident = args[-1].strip('"')  # path (or sole name); format arg ignored
            return Node(op="tbl", ident=ident)
        if re.match(r"^[A-Za-z_][\w.]*$", t):
            return Node(op="tbl", ident=t)
        raise ValueError(f"unexpected token {t!r}")

    node = parse_node()
    if pos != len(tokens):
        raise ValueError(f"trailing tokens: {tokens[pos:]}")
    return node


# ---------------------------------------------------------------- compilation
Resolver = Callable[[str], DataFrame]


def compile_join_expr(
    expr: str | Node,
    resolver: Resolver,
    key: str = "k",
    value: str = "v",
    key_transform: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Compile a join expression to a DataFrame.

    Every leaf must resolve to a DataFrame with columns (key, value).
    Result: column `key` + one value column per leaf slot `v0..vn`
    (TupleWritable analog — absent slots are NULL), except `override`
    which collapses its children to a single value column where the
    rightmost non-null wins (OverrideRecordReader.java:36,49).

    `key_transform` is the `mapred.join.keycomparator` analog (Parser.
    java's comparator class option): a custom WritableComparator there
    defines which keys count as equal; in relational terms that's a
    normalization into equivalence classes, so here it's a Column
    function applied to every leaf's key before joining (e.g.
    `F.lower` for a case-insensitive comparator). The output key is
    the normalized representative. Comparators that only reORDER keys
    without changing equality don't affect a hash join and need no
    analog.
    """
    node = parse_join_expr(expr) if isinstance(expr, str) else expr
    counter = [0]

    def build(n: Node) -> tuple[DataFrame, list[str]]:
        if n.op == "tbl":
            slot = f"v{counter[0]}"
            counter[0] += 1
            k_expr = (
                key_transform(F.col(key)).alias(key)
                if key_transform is not None
                else F.col(key)
            )
            df = resolver(n.ident).select(k_expr, F.col(value).alias(slot))
            return df, [slot]

        parts = [build(c) for c in n.children]
        how = "inner" if n.op == "inner" else "full_outer"
        # USING-column join: Spark coalesces `key` across full outers.
        joined = reduce(lambda a, b: a.join(b, on=key, how=how),
                        (df for df, _ in parts))
        slots = [s for _, ss in parts for s in ss]
        if n.op == "override":
            # rightmost source defining the key wins; the collapsed
            # column keeps the leftmost slot's name (stable v0-style
            # numbering regardless of nesting depth)
            slot = slots[0]
            joined = joined.select(
                F.col(key), F.coalesce(*[F.col(s) for s in reversed(slots)]).alias(slot)
            )
            slots = [slot]
        return joined, slots

    df, _ = build(node)
    return df


# ------------------------------------------------------- tagged reduce-side join
def tagged_join(sources: dict[str, DataFrame], key: str = "k") -> DataFrame:
    """DataJoinReducerBase facade: tag → union → group → cross product.

    In Spark the tag/union/regroup machinery collapses to a chained
    inner join; kept as a named operator for API parity. Tags become
    value-column suffixes.
    """
    dfs = []
    for tag, df in sources.items():
        vals = [c for c in df.columns if c != key]
        dfs.append(df.select(F.col(key), *[F.col(c).alias(f"{c}_{tag}") for c in vals]))
    return reduce(lambda a, b: a.join(b, on=key, how="inner"), dfs)


def broadcast_join(big: DataFrame, small: DataFrame, on, how: str = "inner") -> DataFrame:
    """DistributedCache map-side hash join analog
    (filecache/DistributedCache.java:81-99): explicitly broadcast the
    small side so no shuffle touches the big side."""
    return big.join(F.broadcast(small), on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS — additive over the reference (SURVEY §2.5 'missing')."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS — additive over the reference."""
    return left.join(right, on=on, how="left_anti")
