"""URL/domain-level filtering (SURVEY §2.5 D36 — the CCNet/RefinedWeb/
Dolma origin gate).

Every published web-corpus pipeline runs one curation stage BEFORE any
content inspection: drop documents whose origin domain is on a
blocklist (adult/malware/spam lists — UT1 is the canonical public one)
or outside an allowlist.  This module is that gate, kept in built-in
column expressions so the verdict is one map stage, plus a broadcast
variant for list-shaped references too large for literals:

- :func:`url_host` — the lowercased host of a URL column (portable
  regex: same pattern string under Spark's ``java.util.regex`` and
  DuckDB's RE2; no lookarounds/backreferences).
- :func:`registrable_domain` — the last two host labels (naive
  eTLD+1: a public-suffix list is data this container doesn't carry;
  the simplification mis-groups multi-label suffixes like ``co.uk``
  and is documented as such — swap in a PSL join for production).
- :func:`synthetic_url` — a DETERMINISTIC URL for corpora that lack
  one (the testdata's ``documents`` table has ``source`` but no
  ``url``): ``https://docs.<source>.example/<doc_id>``, so the host
  (``docs.src7.example``) and the registrable domain
  (``src7.example``) exercise the real extraction path.
- :func:`domain_gate` — boolean "passes" column against literal
  lists (pure map stage, zero Exchange — the ``pii_gate`` shape).
- :func:`domain_gate_frame` — the same verdict against a DataFrame
  blocklist/allowlist (one broadcast left join each; the shape a
  multi-million-row UT1 list needs — a literal ``isin`` of that size
  would blow up codegen).
- :func:`domain_profile` — per-registrable-domain document counts
  (the observability view a blocklist review starts from).

Funnel wiring: ``curate_annotated(blocked_domains=... /
allowed_domains=... [, url_col=...])`` rejects as ``blocked_domain``,
FIRST in the gate chain (origin gating precedes content gating in
every published pipeline — a blocked site's text never reaches the
quality scorers).  ``CurationSink(blocklist_path= / allowlist_path=)``
loads parquet domain lists once and applies the gate every
micro-batch.

Scale shape: literal lists are pure column arithmetic (zero Exchange,
plan-gated in tests/test_domains.py); DataFrame lists are one
broadcast join per list against a corpus-side map stage — no corpus
shuffle either way, linear in corpus rows at 100 TB.

Reference provenance: the reference plugin (Cassandra KV/lease layer,
``CassandraListenerRegistry.scala:27``) has no document pipeline; this
is part of the LLM-pipeline closure built on the engine's own
operators (round-14 verdict #3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Host part of a URL: scheme '://', optional userinfo '@', then
# everything up to the first '/', ':', '?' or '#'.  Portable: no
# lookarounds, no backreferences (Java regex AND RE2).
URL_HOST_PATTERN = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)"


def _as_col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def url_host(url_col: str | Column = "url") -> Column:
    """Lowercased host of the URL ('' when the value isn't URL-shaped —
    the gate then treats the row as unattributable, which REJECTS under
    an allowlist and passes under a pure blocklist, the conservative
    posture either way)."""
    return F.lower(
        F.regexp_extract(_as_col(url_col), URL_HOST_PATTERN, 1)
    ).alias("host")


def registrable_domain(host_col: str | Column = "host") -> Column:
    """Last two labels of the host (``docs.src7.example`` ->
    ``src7.example``); hosts with <= 2 labels pass through unchanged.
    Naive eTLD+1 — see module doc for the public-suffix caveat."""
    host = _as_col(host_col)
    parts = F.split(host, r"\.")
    return F.when(F.size(parts) <= 2, host).otherwise(
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    ).alias("domain")


def synthetic_url(source_col: str | Column = "source",
                  id_col: str | Column = "doc_id") -> Column:
    """Deterministic per-document URL for corpora without one:
    ``https://docs.<source>.example/<doc_id>`` (non-hostname chars in
    the source sanitized to '-').  '.example' is the IANA-reserved TLD,
    so synthetic origins can never collide with a real blocklist
    entry."""
    safe = F.lower(
        F.regexp_replace(_as_col(source_col), r"[^A-Za-z0-9-]", "-")
    )
    return F.concat(
        F.lit("https://docs."), safe, F.lit(".example/"),
        _as_col(id_col).cast("string"),
    ).alias("url")


def _norm_list(domains) -> list[str]:
    return sorted({str(d).strip().lower() for d in domains if str(d).strip()})


def domain_gate(url_col: str | Column = "url",
                blocklist=None, allowlist=None) -> Column:
    """True when the URL's registrable domain passes the literal
    lists: not on ``blocklist``, and on ``allowlist`` when one is
    given (block wins over allow, the UT1-pipeline convention).  Pure
    map stage — the funnel's ``blocked_domain`` gate shape.  For
    list-shaped references too large for literals use
    :func:`domain_gate_frame`."""
    if blocklist is None and allowlist is None:
        raise ValueError(
            "domain_gate needs blocklist= and/or allowlist=: with "
            "neither the gate would silently pass everything"
        )
    dom = registrable_domain(url_host(url_col))
    passes = F.lit(True)
    if allowlist is not None:
        al = _norm_list(allowlist)
        passes = dom.isin(al) if al else F.lit(False)
    if blocklist is not None:
        bl = _norm_list(blocklist)
        if bl:
            passes = passes & ~dom.isin(bl)
    return passes.alias("passes_domain")


def domain_gate_frame(df: DataFrame, blocklist: DataFrame | None = None,
                      allowlist: DataFrame | None = None,
                      url_col: str = "url",
                      out_col: str = "passes_domain") -> DataFrame:
    """``df`` plus a boolean ``out_col``, the same verdict as
    :func:`domain_gate` but against DataFrame lists (single ``domain``
    string column each; matching is on the lowercased registrable
    domain).  One broadcast LEFT join per list — the corpus side never
    shuffles, so a multi-million-domain UT1-class list costs one
    broadcast build, not a codegen-hostile literal."""
    if blocklist is None and allowlist is None:
        raise ValueError(
            "domain_gate_frame needs blocklist= and/or allowlist=: "
            "with neither the gate would silently pass everything"
        )
    out = df.withColumn(
        "__dom", registrable_domain(url_host(url_col))
    )
    passes = F.lit(True)
    if allowlist is not None:
        al = allowlist.select(
            F.lower(F.col("domain")).alias("__dom"),
            F.lit(True).alias("__dom_allowed"),
        ).distinct()
        out = out.join(F.broadcast(al), "__dom", "left")
        passes = F.coalesce(F.col("__dom_allowed"), F.lit(False))
    if blocklist is not None:
        bl = blocklist.select(
            F.lower(F.col("domain")).alias("__dom"),
            F.lit(True).alias("__dom_blocked"),
        ).distinct()
        out = out.join(F.broadcast(bl), "__dom", "left")
        passes = passes & F.col("__dom_blocked").isNull()
    return out.withColumn(out_col, passes).drop(
        "__dom", "__dom_allowed", "__dom_blocked"
    )


def domain_profile(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(domain, docs) counts by registrable domain, descending then
    domain — one grouped pass, group count = distinct origins (the
    view a blocklist audit reads first)."""
    return (
        df.groupBy(
            registrable_domain(url_host(url_col)).alias("domain")
        )
        .agg(F.count(F.lit(1)).alias("docs"))
        .orderBy(F.col("docs").desc(), "domain")
    )
