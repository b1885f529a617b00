"""URL canonicalization as pure-Catalyst column expressions.

The north-star input table (BASELINE.json input_hint) keys pages by
``url:string``; every web-scale linkage/dedup pipeline needs a canonical
form before urls can serve as join/group keys (the same page is crawled
as ``HTTP://WWW.Host.com:80/a/?utm_source=x`` and ``http://host.com/a``).
The rules here are the widely-published safe subset (RFC 3986 §6 syntax-
based normalization plus the tracking-parameter strip every crawl
pipeline applies):

  * lowercase scheme and host
  * drop the fragment
  * drop a leading ``www.`` host label
  * drop the DEFAULT port only (80 for http, 443 for https) — a
    non-default port is load-bearing and survives
  * strip trailing slashes from the path
  * drop tracking query parameters (``utm_*``, ``fbclid``, ``gclid``,
    ``ref``), sort the survivors bytewise, re-join with ``&``

Everything is built from codegen-friendly built-ins (regexp_extract /
lower / array_sort / filter) — no UDF, no shuffle: canonicalization is a
per-row projection that fuses into whatever scan feeds it, so at 10^12
rows it costs one whole-stage-codegen pass and nothing else.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# query parameters that never identify content (tracking/attribution)
TRACKING_PARAM_PREFIXES = ("utm_",)
TRACKING_PARAM_NAMES = ("fbclid", "gclid", "ref")


def _scheme(u: Column) -> Column:
    return F.lower(F.regexp_extract(u, r"^([^:/?#]+)://", 1))


def _hostport(u: Column) -> Column:
    return F.regexp_extract(u, r"^[^:/?#]+://([^/?#]*)", 1)


def url_host(u: Column) -> Column:
    """Lowercased host with any leading ``www.`` label removed."""
    host = F.lower(F.regexp_extract(_hostport(u), r"^([^:]*)", 1))
    return F.regexp_replace(host, r"^www\.", "")


def registered_domain(host: Column) -> Column:
    """Naive eTLD+1: the last two dot-labels of the host.

    A production pipeline substitutes the Public Suffix List here (so
    ``a.co.uk`` groups under ``a.co.uk`` not ``co.uk``); the list is
    external data this sandbox does not ship, and the grouping SHAPE —
    a per-row projection feeding a groupBy key — is identical."""
    return F.coalesce(
        F.nullif(F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1), F.lit("")),
        host)


def _kept_port(u: Column) -> Column:
    """':port' suffix, empty when absent or default for the scheme."""
    port = F.regexp_extract(_hostport(u), r":([0-9]+)$", 1)
    scheme = _scheme(u)
    default = ((scheme == "http") & (port == "80")) | \
              ((scheme == "https") & (port == "443"))
    return F.when((port == "") | default, F.lit("")) \
            .otherwise(F.concat(F.lit(":"), port))


def _path(u: Column) -> Column:
    p = F.regexp_extract(u, r"^[^:/?#]+://[^/?#]*(/[^?#]*)?", 1)
    return F.regexp_replace(p, r"/+$", "")


def _is_tracking(x: Column) -> Column:
    cond = F.lit(False)
    for p in TRACKING_PARAM_PREFIXES:
        cond = cond | x.startswith(p)
    for n in TRACKING_PARAM_NAMES:
        cond = cond | x.startswith(n + "=")
    return cond


def _query(u: Column) -> Column:
    """Sorted, tracking-stripped query string (no leading '?')."""
    raw = F.regexp_extract(u, r"\?([^#]*)", 1)
    kept = F.array_sort(F.filter(
        F.split(raw, "&"), lambda x: (x != "") & ~_is_tracking(x)))
    return F.array_join(kept, "&")


def canonical_url(u: Column) -> Column:
    """Full canonical form (see module docstring for the rule set)."""
    q = _query(u)
    return F.concat(
        _scheme(u), F.lit("://"), url_host(u), _kept_port(u), _path(u),
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)))
