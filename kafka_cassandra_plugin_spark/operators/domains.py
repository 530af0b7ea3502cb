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
- :func:`registrable_domain` — eTLD+1.  Default: last two host labels
  (naive, zero-dependency; mis-groups multi-label suffixes like
  ``co.uk``).  With ``psl=`` (:func:`psl_snapshot` ships a committed
  public-suffix snapshot) multi-label registry suffixes group
  correctly: ``a.b.co.uk`` -> ``b.co.uk``.  For a complete
  publicsuffix.org file, :func:`registrable_domain_frame` does the
  same with two broadcast joins instead of literals.
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

import os

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
    posture either way).  Trailing dots are stripped (round-14 advice:
    ``https://docs.bad.example./x`` is valid FQDN form; without the
    strip its last label is the empty string, ``registrable_domain``
    yields ``example.``, and the row bypasses a blocklist entry for
    ``bad.example`` even though it IS attributable)."""
    return F.regexp_replace(
        F.lower(F.regexp_extract(_as_col(url_col), URL_HOST_PATTERN, 1)),
        r"\.+$", "",
    ).alias("host")


def psl_snapshot() -> list[str]:
    """The committed public-suffix snapshot (data/
    public_suffix_snapshot.txt): a curated SUBSET of the
    publicsuffix.org ICANN section — plain 2-/3-label registry
    suffixes (``co.uk``-class), no wildcard/exception rules.  For a
    production crawl load the complete file through the same path (or
    :func:`registrable_domain_frame` when literals get large)."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "public_suffix_snapshot.txt",
    )
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip().lower()
            if line and not line.startswith("#"):
                out.append(line)
    return out


def _psl_by_depth(psl) -> tuple[list[str], list[str]]:
    """(2-label, 3-label) suffix subsets; anything else raises — the
    snapshot path handles plain 2/3-label suffixes only (wildcard and
    exception rules need the full-PSL frame path, documented)."""
    if isinstance(psl, (str, bytes)):
        raise TypeError(
            "psl= expects an iterable of suffixes (use psl_snapshot()), "
            f"got a bare {type(psl).__name__}"
        )
    two, three = [], []
    for s in psl:
        s = str(s).strip().lower()
        if not s:
            continue
        n = s.count(".") + 1
        if n == 2:
            two.append(s)
        elif n == 3:
            three.append(s)
        elif n == 1:
            continue  # 1-label TLDs are the default rule already
        else:
            raise ValueError(
                f"unsupported public-suffix depth {n} ({s!r}): the "
                "literal path handles 2-/3-label suffixes; use "
                "registrable_domain_frame for a full PSL"
            )
    return sorted(set(two)), sorted(set(three))


def registrable_domain(host_col: str | Column = "host",
                       psl=None) -> Column:
    """eTLD+1 of the host.

    Default (``psl=None``): last two labels (``docs.src7.example`` ->
    ``src7.example``); hosts with <= 2 labels pass through unchanged.
    Naive, zero-dependency — mis-groups multi-label registry suffixes
    (``a.b.co.uk`` -> ``co.uk``), documented since round 14.

    With ``psl=`` (an iterable of public suffixes, e.g.
    :func:`psl_snapshot`): when the host's 3-label tail is a listed
    suffix the registrable domain keeps 4 labels, when its 2-label
    tail is listed it keeps 3 (``a.b.co.uk`` -> ``b.co.uk``); a host
    that IS a listed suffix passes through whole (no registrable
    domain exists — same conservative pass-through as the <=2-label
    rule).  Still a pure column expression, zero Exchange: the
    snapshot is a few hundred literals, well inside codegen comfort;
    for a complete PSL use :func:`registrable_domain_frame`."""
    host = _as_col(host_col)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    naive = F.when(n <= 2, host).otherwise(
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    )
    if psl is None:
        return naive.alias("domain")
    two, three = _psl_by_depth(psl)
    # try_element_at: under ANSI semantics a plain element_at(-3) on a
    # 2-label host THROWS even when the surrounding condition is false
    # (& does not short-circuit); NULL propagates to a false isin instead
    last2 = F.concat_ws(
        ".", F.try_element_at(parts, F.lit(-2)),
        F.try_element_at(parts, F.lit(-1)))
    last3 = F.concat_ws(
        ".", F.try_element_at(parts, F.lit(-3)),
        F.try_element_at(parts, F.lit(-2)), F.try_element_at(parts, F.lit(-1)))
    last4 = F.concat_ws(
        ".", F.try_element_at(parts, F.lit(-4)), F.try_element_at(parts, F.lit(-3)),
        F.try_element_at(parts, F.lit(-2)), F.try_element_at(parts, F.lit(-1)))
    out = naive
    if two:
        out = (
            F.when((n >= 3) & last2.isin(two), last3)
            .when((n == 2) & last2.isin(two), host)
            .otherwise(out)
        )
    if three:
        out = (
            F.when((n >= 4) & last3.isin(three), last4)
            .when((n == 3) & last3.isin(three), host)
            .otherwise(out)
        )
    return out.alias("domain")


def registrable_domain_frame(df: DataFrame, psl: DataFrame,
                             host_col: str = "host",
                             out_col: str = "domain") -> DataFrame:
    """``df`` plus ``out_col`` = eTLD+1 against a DataFrame public-
    suffix list (single ``suffix`` string column — the complete
    publicsuffix.org file is ~9k plain rows, too many for comfortable
    codegen literals).  Two broadcast LEFT joins (the host's 2-label
    tail vs 2-label suffixes, 3-label tail vs 3-label suffixes) decide
    how many labels the registrable domain keeps; the corpus side never
    shuffles, so the shape is linear at 100 TB exactly like
    :func:`domain_gate_frame`.  Wildcard/exception PSL rules are out of
    scope (documented in the data file)."""
    parts = F.split(F.col(host_col), r"\.")
    n = F.size(parts)
    # try_element_at: under ANSI semantics a plain element_at(-3) on a
    # 2-label host THROWS even when the surrounding condition is false
    # (& does not short-circuit); NULL propagates to a false isin instead
    last2 = F.concat_ws(
        ".", F.try_element_at(parts, F.lit(-2)),
        F.try_element_at(parts, F.lit(-1)))
    last3 = F.concat_ws(
        ".", F.try_element_at(parts, F.lit(-3)),
        F.try_element_at(parts, F.lit(-2)), F.try_element_at(parts, F.lit(-1)))
    last4 = F.concat_ws(
        ".", F.try_element_at(parts, F.lit(-4)), F.try_element_at(parts, F.lit(-3)),
        F.try_element_at(parts, F.lit(-2)), F.try_element_at(parts, F.lit(-1)))
    suf = psl.select(F.lower(F.col("suffix")).alias("suffix")).distinct()
    depth = F.size(F.split(F.col("suffix"), r"\."))
    s2 = suf.where(depth == 2).select(
        F.col("suffix").alias("__s2"), F.lit(True).alias("__is2"))
    s3 = suf.where(depth == 3).select(
        F.col("suffix").alias("__s3"), F.lit(True).alias("__is3"))
    out = (
        df.withColumn("__l2", last2).withColumn("__l3", last3)
        .join(F.broadcast(s2), F.col("__l2") == F.col("__s2"), "left")
        .join(F.broadcast(s3), F.col("__l3") == F.col("__s3"), "left")
    )
    host = F.col(host_col)
    naive = F.when(n <= 2, host).otherwise(last2)
    dom = (
        F.when((n >= 4) & F.col("__is3").isNotNull(), last4)
        .when((n == 3) & F.col("__is3").isNotNull(), host)
        .when((n >= 3) & F.col("__is2").isNotNull(), last3)
        .when((n == 2) & F.col("__is2").isNotNull(), host)
        .otherwise(naive)
    )
    return out.withColumn(out_col, dom).drop(
        "__l2", "__l3", "__s2", "__s3", "__is2", "__is3")


def psl_domain_sql_case(host: str, psl) -> str:
    """DuckDB CASE expression mirroring :func:`registrable_domain`'s
    PSL path over a host-valued SQL expression — the oracle twin for
    pytest DuckDB comparisons (same 2-/3-label snapshot scope)."""
    two, three = _psl_by_depth(psl)

    def inlist(vals):
        return ", ".join("'" + v.replace("'", "''") + "'" for v in vals)

    p = f"string_split({host}, '.')"
    n = f"len({p})"
    last2 = f"({p}[-2] || '.' || {p}[-1])"
    last3 = f"({p}[-3] || '.' || {p}[-2] || '.' || {p}[-1])"
    last4 = (f"({p}[-4] || '.' || {p}[-3] || '.' || {p}[-2] || '.' || "
             f"{p}[-1])")
    naive = f"CASE WHEN {n} <= 2 THEN {host} ELSE {last2} END"
    branches = []
    if three:
        branches += [
            f"WHEN {n} >= 4 AND {last3} IN ({inlist(three)}) THEN {last4}",
            f"WHEN {n} = 3 AND {last3} IN ({inlist(three)}) THEN {host}",
        ]
    if two:
        branches += [
            f"WHEN {n} >= 3 AND {last2} IN ({inlist(two)}) THEN {last3}",
            f"WHEN {n} = 2 AND {last2} IN ({inlist(two)}) THEN {host}",
        ]
    if not branches:
        return naive
    return "CASE " + " ".join(branches) + f" ELSE {naive} END"


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
    if isinstance(domains, (str, bytes)):
        # round-14 advice: blocked_domains='bad.example' would iterate
        # characters and silently build a gate of single-char 'domains'
        # that matches nothing - a no-op blocklist with no error
        raise TypeError(
            "expected an iterable of domains (list/set/tuple), got a "
            f"bare {type(domains).__name__}: wrap it in a list"
        )
    return sorted({str(d).strip().lower() for d in domains if str(d).strip()})


def domain_gate(url_col: str | Column = "url",
                blocklist=None, allowlist=None, psl=None) -> Column:
    """True when the URL's registrable domain passes the literal
    lists: not on ``blocklist``, and on ``allowlist`` when one is
    given (block wins over allow, the UT1-pipeline convention).  Pure
    map stage — the funnel's ``blocked_domain`` gate shape.  For
    list-shaped references too large for literals use
    :func:`domain_gate_frame`.  ``psl=`` (iterable of public suffixes,
    e.g. :func:`psl_snapshot`) upgrades the eTLD+1 grouping — the list
    entries must then be PSL-grouped domains too (``b.co.uk``, not
    ``co.uk``)."""
    if blocklist is None and allowlist is None:
        raise ValueError(
            "domain_gate needs blocklist= and/or allowlist=: with "
            "neither the gate would silently pass everything"
        )
    dom = registrable_domain(url_host(url_col), psl=psl)
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
                      out_col: str = "passes_domain",
                      psl=None) -> DataFrame:
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
        "__dom", registrable_domain(url_host(url_col), psl=psl)
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
