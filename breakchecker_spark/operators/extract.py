"""Page processing: one declarative pass from fetched pages to
(link candidates, contact candidates).

Reproduces the reference's per-page `_process_url` + `extract_data`
(/root/reference/break_checker.py:1352-1444) as column expressions:

* pass 1 — regex sweep over the raw page string (bc:1374-1379);
* pass 2 — regex sweep over the visible text, which finds emails split
  across tags (bc:1381-1383); the pages table's ``text`` column is
  authoritative for this (input_hint byte-identical invariant);
* pass 3 — mailto:/tel: anchors (bc:1385-1395);
* link/script harvesting with canonicalization, asset-skip, and the
  ``.js``/``.mjs``-only rule for scripts (bc:1397-1421);
* JS-fetched URLs: emails only, from the raw content; no phones, no
  link following (bc:1374-1377).

Everything runs on Arrow batches (pandas UDFs parse each page once);
the surrounding plumbing (decode, when/otherwise masking, explode,
joins) is native Catalyst expressions.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame, Observation, functions as F
from pyspark.sql import types as T

from ..functions import udfs


class DropCounters:
    """Exact kept/dropped counters (reference bc:1238-1241), computed
    for free inside whatever action first materializes the contacts
    plan (``df.observe`` / CollectMetrics — no separate count job).

    ``get()`` blocks until that action completes, then returns
    [(metric, value), ...].
    """

    def __init__(self, email_obs: Observation, phone_obs: Observation) -> None:
        self._email_obs = email_obs
        self._phone_obs = phone_obs

    def get(self) -> list[tuple[str, int]]:
        return [
            ("emails_dropped", int(self._email_obs.get["value"])),
            ("phones_dropped", int(self._phone_obs.get["value"])),
        ]

class PreDrops:
    """:class:`DropCounters` twin for the pre-extracted path: dropped
    counts come pre-aggregated per page from the pre-extraction pass
    and are summed per round by an Observation on the frontier⋈pre
    join — same in-band, no-extra-job contract."""

    def __init__(self, obs: Observation) -> None:
        self._obs = obs

    def get(self) -> list[tuple[str, int]]:
        m = self._obs.get
        return [
            ("emails_dropped", int(m["ed"])),
            ("phones_dropped", int(m["pd"])),
        ]


_JS_PATH = r"\.m?js$"


def is_js_url(url_col):
    """True when the URL's *path* ends .js/.mjs (bc:1374)."""
    return udfs.url_path(url_col).rlike(_JS_PATH)


def _enrich(src: DataFrame, keep: list[str]) -> DataFrame:
    """Shared per-page feature pass: (keep..., hrefs, script_srcs,
    emails_raw, phones_raw, _is_js) from (url, html, text) rows —
    passes 1-3 of the module docstring as one FUSED Arrow pipeline
    (udfs.page_features: the big raw string crosses the Arrow boundary
    once; one python runner instead of three chained ones)."""
    raw_str = F.when(
        F.col("html").isNotNull(), F.decode(F.col("html"), "UTF-8")
    ).otherwise(F.col("text"))

    base = (
        src.filter(F.col("html").isNotNull() | F.col("text").isNotNull())
        .withColumn("_is_js", is_js_url(F.col("url")))
        .withColumn("_raw", raw_str)
    )

    feats = base.withColumn(
        "_pf", udfs.page_features(F.col("_raw"), F.col("text"), F.col("_is_js"))
    )
    return feats.select(
        *keep,
        F.col("_pf.hrefs").alias("hrefs"),
        F.col("_pf.script_srcs").alias("script_srcs"),
        F.col("_pf.emails_raw").alias("emails_raw"),
        F.col("_pf.phones_raw").alias("phones_raw"),
        F.col("_is_js"),
    )


def process_pages(
    fetched: DataFrame,
    scope_host: str,
    default_region: str | None,
    org_domain: str,
) -> Tuple[DataFrame, DataFrame, DataFrame, list]:
    """(link_candidates, contacts, drop_metrics, caches) from fetched rows.

    ``fetched``: (url, depth, html, text) — the frontier joined
    against the pages table (or live-fetched). Returns:

    * link_candidates: (url, host, skey, depth) at depth+1, canonical
      + deduped per page, host/struct-key precomputed (pure functions
      of the link url), ready for the seen filter;
    * contacts: (kind, identifier, source_url, depth) normalized, org-
      scoped (emails) / region-validated (phones);
    * drops: exact kept/dropped counts (reference counters
      bc:1238-1241), observed inside the action that materializes
      contacts (no separate aggregation job; call ``drops.get()`` only
      after that action);
    * caches: cached intermediate DataFrames — caller unpersists them
      once the round's outputs are materialized.

    r6: one fused mapInPandas stage per round (the same
    :func:`_fused_preextract_fn` the pre-extract pass uses, with depth
    riding through), replacing the chained pandas-UDF pipeline — the
    classic/live rounds carry a single Python stage and the downstream
    candidate build is pure Catalyst. The chained form stays as
    :func:`process_pages_chained` for the equality test.
    """
    base = (
        fetched.select("url", "depth", "html", "text")
        .filter(F.col("html").isNotNull() | F.col("text").isNotNull())
        .select(
            "url",
            "depth",
            F.when(F.col("html").isNotNull(), F.decode(F.col("html"), "UTF-8"))
            .otherwise(F.col("text"))
            .alias("_raw"),
            "text",
        )
    )
    depth_field = fetched.schema["depth"]
    enr = base.mapInPandas(
        _fused_preextract_fn(
            scope_host, default_region, org_domain, passthrough=("depth",)
        ),
        schema=_pre_schema(
            (T.StructField("depth", depth_field.dataType, depth_field.nullable),)
        ),
    ).cache()
    drop_obs = Observation()
    observed = enr.observe(
        drop_obs,
        F.coalesce(F.sum("emails_dropped"), F.lit(0)).alias("ed"),
        F.coalesce(F.sum("phones_dropped"), F.lit(0)).alias("pd"),
    )
    link_candidates = (
        observed.select(
            F.explode("links").alias("_l"),
            (F.col("depth") + 1).alias("depth"),
        )
        .select("_l.url", "_l.host", "_l.skey", "depth")
        .distinct()
    )
    contacts = observed.select(
        "url", "depth", F.explode("contacts").alias("_c")
    ).select(
        F.col("_c.kind").alias("kind"),
        F.col("_c.identifier").alias("identifier"),
        F.col("url").alias("source_url"),
        "depth",
    )
    return link_candidates, contacts, PreDrops(drop_obs), [enr]


def process_pages_chained(
    fetched: DataFrame,
    scope_host: str,
    default_region: str | None,
    org_domain: str,
) -> Tuple[DataFrame, DataFrame, DataFrame, list]:
    """The pre-r6 chained-UDF form of :func:`process_pages`
    (page_features → canonical_links ×2 → exploded normalize chains
    with CollectMetrics counters). Kept as the reference
    implementation for the fused≡chained classic-round equality test —
    not on any hot path. Its link_candidates carry (url, depth) only.
    """
    enriched = _enrich(fetched, ["url", "depth"]).cache()

    # ---- link candidates (depth + 1) -------------------------------
    links_udf = udfs.make_canonical_links_udf(scope_host, js_only=False)
    scripts_udf = udfs.make_canonical_links_udf(scope_host, js_only=True)
    link_candidates = (
        enriched.filter(~F.col("_is_js"))
        .select(
            F.explode(
                F.concat(
                    links_udf(F.col("url"), F.col("hrefs")),
                    scripts_udf(F.col("url"), F.col("script_srcs")),
                )
            ).alias("url"),
            (F.col("depth") + 1).alias("depth"),
        )
        .distinct()
    )

    # ---- contacts ---------------------------------------------------
    email_rows_c = (
        enriched.select("url", "depth", F.explode("emails_raw").alias("_raw_id"))
        .withColumn("identifier", udfs.normalize_email(F.col("_raw_id")))
        .withColumn(
            "_org_ok",
            F.when(
                F.col("identifier").isNotNull(),
                udfs.email_org(F.col("identifier")) == F.lit(org_domain),
            ).otherwise(F.lit(False)),
        )
    ).cache()
    phone_rows_c = (
        enriched.select("url", "depth", F.explode("phones_raw").alias("_raw_id"))
        .withColumn(
            "identifier",
            udfs.normalize_phone(F.col("_raw_id"), F.lit(default_region)),
        )
    ).cache()

    # ---- exact kept/dropped counters, observed in-band --------------
    # CollectMetrics nodes sit below the keep-filters, so the counts
    # ride along with the contacts-materializing action instead of a
    # second scan job per round (r2 verdict: cut fixed round cost).
    email_obs, phone_obs = Observation(), Observation()
    email_rows = email_rows_c.observe(
        email_obs,
        F.coalesce(
            F.sum(F.when(~F.col("_org_ok"), 1).otherwise(0)), F.lit(0)
        ).alias("value"),
    )
    phone_rows = phone_rows_c.observe(
        phone_obs,
        F.coalesce(
            F.sum(F.when(F.col("identifier").isNull(), 1).otherwise(0)), F.lit(0)
        ).alias("value"),
    )

    contacts = (
        email_rows.filter(F.col("_org_ok"))
        .select(
            F.lit("email").alias("kind"),
            "identifier",
            F.col("url").alias("source_url"),
            "depth",
        )
        .unionByName(
            phone_rows.filter(F.col("identifier").isNotNull()).select(
                F.lit("phone").alias("kind"),
                "identifier",
                F.col("url").alias("source_url"),
                "depth",
            )
        )
    )

    caches = [enriched, email_rows_c, phone_rows_c]
    return link_candidates, contacts, DropCounters(email_obs, phone_obs), caches


# --------------------------------------------------------- pre-extraction

_NORM_CONTACTS_T = T.StructType(
    [
        T.StructField(
            "contacts",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType()),
                        T.StructField("identifier", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("emails_dropped", T.LongType()),
        T.StructField("phones_dropped", T.LongType()),
    ]
)


def _make_normalize_contacts_udf(default_region: str | None, org_domain: str):
    """Per-page contact normalization + org/region filtering as ONE
    Arrow batch op (no explode/groupBy shuffle): semantically identical
    to process_pages' exploded normalize→filter chain, applied to each
    page's (small) raw arrays in place."""
    from ..functions import contacts as cfn

    @F.pandas_udf(_NORM_CONTACTS_T)
    def norm(emails_raw, phones_raw):
        import pandas as pd

        out = []
        for es, ps in zip(emails_raw, phones_raw):
            kept: list[dict] = []
            ed = pd_ = 0
            for raw in es if es is not None else []:
                ident = cfn.normalize_email(raw) if raw else None
                if ident is not None and cfn.email_org(ident) == org_domain:
                    kept.append({"kind": "email", "identifier": ident})
                else:
                    ed += 1
            for raw in ps if ps is not None else []:
                ident = cfn.normalize_phone(raw, default_region) if raw else None
                if ident is not None:
                    kept.append({"kind": "phone", "identifier": ident})
                else:
                    pd_ += 1
            out.append((kept, ed, pd_))
        return pd.DataFrame(out, columns=["contacts", "emails_dropped", "phones_dropped"])

    return norm


_PRE_LINK_T = T.StructType(
    [
        T.StructField("url", T.StringType()),
        # host/skey are pure functions of the link url (url_host /
        # struct_key_str), computed here so the per-round frontier
        # build needs NO Python stage — key_hash stays a JVM
        # xxhash64(skey) projection (operators/seen.with_struct_key)
        T.StructField("host", T.StringType()),
        T.StructField("skey", T.StringType()),
    ]
)

_PRE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("links", T.ArrayType(_PRE_LINK_T)),
        T.StructField(
            "contacts",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType()),
                        T.StructField("identifier", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("emails_dropped", T.LongType()),
        T.StructField("phones_dropped", T.LongType()),
    ]
)


def _fused_preextract_fn(
    scope_host: str,
    default_region: str | None,
    org_domain: str,
    passthrough: tuple = (),
):
    """Whole-page extraction (harvest + sweeps + canonical links +
    contact normalization) as ONE mapInPandas stage.

    Row-for-row identical to the chained plan in
    :func:`preextract_pages_chained` (page_features →
    canonical_links ×2 → normalize-contacts), which it replaces on the
    hot path: the chained form is four dependent pandas UDFs, i.e.
    three extra JVM↔Python Arrow round trips of every batch per pass —
    measured ~90% of the pre-extract wall time on the bench corpus
    (the pure-Python page work is ~14 core-seconds per 100k pages).
    Equality is pinned by tests/test_crawl_e2e.py's fused≡chained
    sweep (exact rows, including per-page link order).
    """
    import re as _re
    from urllib.parse import urlparse

    from ..functions import contacts as cfn
    from ..functions import htmlx, textnorm, urlnorm

    js_re = _re.compile(_JS_PATH)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            urls, links_out, contacts_out = [], [], []
            ed_out, pd_out = [], []
            for url, doc, txt in zip(pdf["url"], pdf["_raw"], pdf["text"]):
                # is_js: url_path + rlike semantics (falsy url → null
                # predicate → behaves as False in both consumers)
                is_js = bool(js_re.search(urlparse(url).path or "/")) if url else False
                if doc is None:
                    doc = ""
                hrefs: list = []
                srcs: list = []
                mailtos: list = []
                tels: list = []
                if not is_js and doc:
                    h = htmlx.harvest(doc, collect_text=False)
                    hrefs, srcs = h.hrefs, h.script_srcs
                    for href in hrefs:
                        low = href.strip().lower()
                        if low.startswith("mailto:"):
                            mailtos.extend(cfn.mailto_addresses(href))
                        elif low.startswith("tel:"):
                            tels.extend(cfn.tel_numbers(href))
                if doc:
                    normed = textnorm.norm_text(doc)
                    e1 = cfn.extract_emails(normed)
                    p1 = cfn.extract_phones(normed)
                else:
                    e1, p1 = [], []
                if not is_js and txt:
                    normed_t = textnorm.norm_text(txt)
                    e2 = cfn.extract_emails(normed_t)
                    p2 = cfn.extract_phones(normed_t)
                else:
                    e2, p2 = [], []
                emails_raw = e1 + e2 + mailtos
                phones_raw = [] if is_js else p1 + p2 + tels

                if is_js:
                    links: list = []
                else:
                    # two independently deduped+sorted lists, then
                    # concatenated — exactly concat(links_udf,
                    # scripts_udf) including cross-list duplicates
                    keep = set()
                    for href in hrefs:
                        cand = urlnorm.canonicalize(url, href, scope_host)
                        if cand is None or urlnorm.skip_by_path(cand):
                            continue
                        keep.add(cand)
                    keep_js = set()
                    for href in srcs:
                        cand = urlnorm.canonicalize(url, href, scope_host)
                        if cand is None or urlnorm.skip_by_path(cand):
                            continue
                        if not cand.lower().endswith((".js", ".mjs")):
                            continue
                        keep_js.add(cand)
                    links = [
                        {
                            "url": u,
                            "host": (urlparse(u).hostname or "").lower(),
                            "skey": urlnorm.struct_key_str(u),
                        }
                        for u in sorted(keep) + sorted(keep_js)
                    ]

                kept: list = []
                ed = pdd = 0
                for raw_mail in emails_raw:
                    ident = cfn.normalize_email(raw_mail) if raw_mail else None
                    if ident is not None and cfn.email_org(ident) == org_domain:
                        kept.append({"kind": "email", "identifier": ident})
                    else:
                        ed += 1
                for raw_ph in phones_raw:
                    ident = (
                        cfn.normalize_phone(raw_ph, default_region) if raw_ph else None
                    )
                    if ident is not None:
                        kept.append({"kind": "phone", "identifier": ident})
                    else:
                        pdd += 1

                urls.append(url)
                links_out.append(links)
                contacts_out.append(kept)
                ed_out.append(ed)
                pd_out.append(pdd)
            out = {
                "url": urls,
                "links": links_out,
                "contacts": contacts_out,
                "emails_dropped": pd.Series(ed_out, dtype="int64"),
                "phones_dropped": pd.Series(pd_out, dtype="int64"),
            }
            # passthrough columns ride along unchanged (one output row
            # per input row, in input order)
            for c in passthrough:
                out[c] = pdf[c].to_numpy()
            yield pd.DataFrame(out)

    return run


def _pre_schema(extra_fields: tuple = ()) -> T.StructType:
    """_PRE_SCHEMA plus caller-supplied passthrough fields."""
    return T.StructType(list(_PRE_SCHEMA.fields) + list(extra_fields))


def preextract_pages(
    pages: DataFrame,
    scope_host: str,
    default_region: str | None,
    org_domain: str,
) -> DataFrame:
    """One extraction pass over the whole pages table → the slim
    per-page table the pre-extract crawl mode joins each round:

        (url, links: array<string>, contacts: array<(kind, identifier)>,
         emails_dropped, phones_dropped)

    Scale rationale: the classic replay loop re-scans the full raw
    pages table every BFS round for the fetch join (depth rounds × the
    whole corpus — at 100 TB that is the dominant non-scaling cost),
    and pays per-round pandas-UDF stage setup. Replay input is static,
    so extraction is paid ONCE in a single embarrassingly-parallel
    pass — the Common-Crawl shape: WARC → extracted link graph →
    iterative BFS over slim rows (~100× smaller than raw pages).
    Per-page outputs are exactly process_pages' (same semantics, same
    filters, same drop counters); tests/test_crawl_e2e.py proves
    mode-for-mode equality of the whole crawl.

    r6: the pass is ONE mapInPandas stage (the raw page crosses the
    Arrow boundary once; see :func:`_fused_preextract_fn`). Bytes→str
    decoding stays in the JVM (``F.decode``) so its replacement-char
    semantics are unchanged."""
    base = (
        pages.select("url", "html", "text")
        .filter(F.col("html").isNotNull() | F.col("text").isNotNull())
        .select(
            "url",
            F.when(F.col("html").isNotNull(), F.decode(F.col("html"), "UTF-8"))
            .otherwise(F.col("text"))
            .alias("_raw"),
            "text",
        )
    )
    return base.mapInPandas(
        _fused_preextract_fn(scope_host, default_region, org_domain),
        schema=_PRE_SCHEMA,
    )


def preextract_pages_chained(
    pages: DataFrame,
    scope_host: str,
    default_region: str | None,
    org_domain: str,
) -> DataFrame:
    """The pre-r6 chained-UDF form of :func:`preextract_pages`
    (page_features → canonical_links ×2 → normalize-contacts). Kept as
    the reference implementation for the fused≡chained equality test —
    not on any hot path."""
    enr = _enrich(pages.select("url", "html", "text"), ["url"])
    links_udf = udfs.make_canonical_links_udf(scope_host, js_only=False)
    scripts_udf = udfs.make_canonical_links_udf(scope_host, js_only=True)
    empty = F.array().cast("array<string>")
    norm_udf = _make_normalize_contacts_udf(default_region, org_domain)
    return enr.select(
        "url",
        F.when(F.col("_is_js"), empty)
        .otherwise(
            F.concat(
                links_udf(F.col("url"), F.col("hrefs")),
                scripts_udf(F.col("url"), F.col("script_srcs")),
            )
        )
        .alias("links"),
        norm_udf(F.col("emails_raw"), F.col("phones_raw")).alias("_nc"),
    ).select(
        "url",
        "links",
        F.col("_nc.contacts").alias("contacts"),
        F.col("_nc.emails_dropped").alias("emails_dropped"),
        F.col("_nc.phones_dropped").alias("phones_dropped"),
    )


def snippet_windows(
    df: DataFrame,
    text_col: str,
    pattern: str,
    width: int = 20,
    out_col: str = "snippets",
) -> DataFrame:
    """X14: per-match ±``width``-char debug context windows.

    Reproduces the reference's snippet construction exactly
    (break_checker.py:1438-1444): ``text[max(start-20,0):end+20]``
    with newlines replaced by spaces, then the log-time whitespace
    collapse ``" ".join(s.strip().split())`` (bc:1287-1289). Emitted
    as an ``array<struct<match,snippet>>`` column so callers explode
    only when debugging — the column is never computed on the
    non-debug path (lazy projection).
    """
    import re as _re

    import pandas as pd
    from pyspark.sql import types as T

    rx = _re.compile(pattern)

    @F.pandas_udf(
        T.ArrayType(
            T.StructType(
                [
                    T.StructField("match", T.StringType()),
                    T.StructField("snippet", T.StringType()),
                ]
            )
        )
    )
    def _snips(texts):
        out = []
        for t in texts:
            if not t:
                out.append([])
                continue
            rows = []
            for m in rx.finditer(t):
                snip = t[max(m.start() - width, 0): m.end() + width].replace(
                    "\n", " "
                )
                rows.append((m.group(), " ".join(snip.strip().split())))
            out.append(rows)
        return pd.Series(out)

    return df.withColumn(out_col, _snips(F.col(text_col)))


def dedup_contacts(contacts: DataFrame) -> DataFrame:
    """First-discovery-wins dedup, pinned deterministically.

    The reference keeps the first scheduler-race winner
    (bc:1278-1283); the pinned rule is min (depth, source_url) —
    SURVEY.md §7.1.
    """
    return contacts.groupBy("kind", "identifier").agg(
        F.min_by("source_url", F.struct("depth", "source_url")).alias("source_url"),
        F.min("depth").alias("depth"),
    )
