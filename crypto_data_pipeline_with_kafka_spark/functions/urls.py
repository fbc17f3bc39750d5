"""URL canonicalization + registrable-domain rollup (r14).

The reference dedups news by RAW url equality — a driver-side
``sent_urls`` set (``dags/producer_news.py:45,56``) and a per-row
``SELECT id FROM news_fact_1 WHERE url=%s`` existence probe
(``dags/consumer_news.py:44-47``) — so the same article re-shared with
``?utm_source=feed`` or an upper-cased host is ingested twice. A
web-scale curation pipeline canonicalizes FIRST: these helpers are the
distributed, column-only form (``parse_url`` + JVM regexp + in-row
higher-order filters — no UDF, no shuffle; the dedup that consumes the
canonical form is the ordinary exact/anti-join machinery).

``registrable_domain`` feeds two consumers: per-domain rollups (the
crawl-frequency / domain-cap stat every pipeline wants) and the
``source`` column of :func:`...operators.sampling.resample_to_mixture`
(domain-mixture resampling). The multi-part-TLD table is a documented
HEURISTIC subset of the Public Suffix List — the full PSL is data, not
code; swap it in here when shipping against real web crawl.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Default query parameters treated as tracking/attribution state.
#: Exact names; ``utm_*`` is matched as a prefix. Deliberately
#: conservative: every default is a vendor-specific click/campaign id
#: that cannot name a resource. Ambiguous names like bare ``ref`` are
#: NOT defaults — plenty of sites use ``?ref=`` for branch/section/
#: product identity, and a canonicalizer that merges those silently
#: DROPS distinct documents in URL dedup; pass
#: ``tracking_params=TRACKING_PARAMS + ("ref",)`` per corpus when the
#: referrer convention is known.
TRACKING_PARAMS = (
    "gclid",
    "fbclid",
    "msclkid",
    "mc_eid",
    "mc_cid",
    "igshid",
    "cmpid",
    "spm",
    "yclid",
)

#: Common multi-part effective TLDs (documented PSL-subset heuristic).
MULTIPART_TLDS = (
    "co.uk",
    "org.uk",
    "ac.uk",
    "gov.uk",
    "co.jp",
    "ne.jp",
    "or.jp",
    "com.au",
    "net.au",
    "org.au",
    "co.nz",
    "com.br",
    "com.mx",
    "co.in",
    "co.kr",
    "com.cn",
    "com.sg",
    "com.tr",
)


def _as_col(url) -> Column:
    return F.col(url) if isinstance(url, str) else url


def _host(url: Column) -> Column:
    """Lowercased hostname: ``try_parse_url(HOST)`` already excludes
    userinfo and the port (the canonicalization drops explicit ports —
    aggressive on purpose: this form exists for DEDUP, where
    ``host:8080`` vs ``host`` is almost always the same resource
    republished, and the trade is documented here)."""
    return F.lower(F.try_parse_url(url, F.lit("HOST")))


def canonicalize_url(url, tracking_params: tuple = TRACKING_PARAMS) -> Column:
    """Canonical form of a URL for identity comparison:

    * scheme and host lowercased; userinfo, explicit port and fragment
      dropped (``parse_url`` parts — JVM-side, no UDF);
    * tracking query params removed (``tracking_params`` exact names —
      default :data:`TRACKING_PARAMS` — plus the ``utm_`` prefix),
      remaining params SORTED so ``?b=2&a=1`` and ``?a=1&b=2`` meet —
      in-row split/filter/array_sort, O(params) per row;
    * trailing slashes stripped from the path (root becomes empty:
      ``https://h/`` -> ``https://h``).

    NULL, scheme-less, and MALFORMED inputs return NULL
    (``try_parse_url`` — plain ``parse_url`` THROWS on an invalid
    URL under ANSI semantics, and one junk string must never kill a
    corpus-wide curation run; hypothesis-fuzzed),
    so a planted-URL consumer can coalesce explicitly. Idempotent:
    ``canonicalize_url(canonicalize_url(u)) == canonicalize_url(u)``
    (pytest-pinned)."""
    url = _as_col(url)
    scheme = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    host = _host(url)
    path = F.regexp_replace(
        F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit("")), "/+$", ""
    )
    query = F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit(""))
    params = F.when(query == "", F.array().cast("array<string>")).otherwise(
        F.split(query, "&")
    )
    name = lambda p: F.element_at(F.split(p, "=", 2), 1)  # noqa: E731
    kept = F.filter(
        params,
        lambda p: ~(
            name(p).startswith("utm_")
            | name(p).isin(*tracking_params)
        ),
    )
    cq = F.array_join(F.array_sort(kept), "&")
    return F.when(
        scheme.isNotNull() & host.isNotNull(),
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(cq == "", F.lit("")).otherwise(F.concat(F.lit("?"), cq)),
        ),
    )


def registrable_domain(url) -> Column:
    """Registrable domain of a URL's host: the last two labels, or the
    last three when the last two form a known multi-part TLD
    (:data:`MULTIPART_TLDS` — the documented PSL-subset heuristic).
    ``www.`` and any other subdomain labels fall away by construction;
    an all-numeric host (IPv4 literal) is returned whole; NULL/
    scheme-less input gives NULL."""
    host = _host(_as_col(url))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    return F.when(host.rlike(r"^[0-9.]+$"), host).otherwise(
        F.when((n >= 3) & last2.isin(*MULTIPART_TLDS), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )
