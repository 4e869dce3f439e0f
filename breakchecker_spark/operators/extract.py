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

from pyspark.sql import DataFrame, functions as F

from ..functions import udfs

_JS_PATH = r"\.m?js$"


def is_js_url(url_col):
    """True when the URL's *path* ends .js/.mjs (bc:1374)."""
    return udfs.url_path(url_col).rlike(_JS_PATH)


def process_pages(
    fetched: DataFrame,
    scope_host: str,
    default_region: str | None,
    org_domain: str,
) -> Tuple[DataFrame, DataFrame, DataFrame, list]:
    """(link_candidates, contacts, drop_metrics, caches) from fetched rows.

    ``fetched``: (url, depth, html[, text]) — the frontier joined
    against the pages table. Returns:

    * link_candidates: (url, depth) at depth+1, canonical + deduped
      per page, ready for the seen filter;
    * contacts: (kind, identifier, source_url, depth) normalized, org-
      scoped (emails) / region-validated (phones);
    * drop_metrics: (metric, value) exact kept/dropped counts
      (reference counters bc:1238-1241);
    * caches: cached intermediate DataFrames — caller unpersists them
      once the round's outputs are materialized.
    """
    raw_str = F.when(
        F.col("html").isNotNull(), F.decode(F.col("html"), "UTF-8")
    ).otherwise(F.col("text"))

    base = (
        fetched.filter(F.col("html").isNotNull() | F.col("text").isNotNull())
        .withColumn("_is_js", is_js_url(F.col("url")))
        .withColumn("_raw", raw_str)
    )

    feats = base.withColumn(
        "_h",
        F.when(F.col("_is_js"), F.lit(None)).otherwise(udfs.harvest_page(F.col("_raw"))),
    )
    empty = F.array().cast("array<string>")

    cand_raw = feats.withColumn("_c1", udfs.extract_candidates(F.col("_raw"))).withColumn(
        "_c2",
        F.when(F.col("_is_js") | F.col("text").isNull(), F.lit(None)).otherwise(
            udfs.extract_candidates(F.col("text"))
        ),
    )

    enriched = cand_raw.select(
        "url",
        "depth",
        F.coalesce(F.col("_h.hrefs"), empty).alias("hrefs"),
        F.coalesce(F.col("_h.script_srcs"), empty).alias("script_srcs"),
        F.concat(
            F.coalesce(F.col("_c1.emails"), empty),
            F.coalesce(F.col("_c2.emails"), empty),
            F.coalesce(F.col("_h.mailto_raw"), empty),
        ).alias("emails_raw"),
        F.when(F.col("_is_js"), empty)
        .otherwise(
            F.concat(
                F.coalesce(F.col("_c1.phones"), empty),
                F.coalesce(F.col("_c2.phones"), empty),
                F.coalesce(F.col("_h.tel_raw"), empty),
            )
        )
        .alias("phones_raw"),
        F.col("_is_js"),
    )
    enriched = enriched.cache()

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
    email_rows = (
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
    phone_rows = (
        enriched.select("url", "depth", F.explode("phones_raw").alias("_raw_id"))
        .withColumn(
            "identifier",
            udfs.normalize_phone(F.col("_raw_id"), F.lit(default_region)),
        )
    ).cache()

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

    # ---- exact kept/dropped metrics (bc:1238-1241 counters) --------
    drop_metrics = email_rows.agg(
        F.lit("emails_dropped").alias("metric"),
        F.coalesce(
            F.sum(F.when(~F.col("_org_ok"), 1).otherwise(0)), F.lit(0)
        ).alias("value"),
    ).unionByName(
        phone_rows.agg(
            F.lit("phones_dropped").alias("metric"),
            F.coalesce(
                F.sum(F.when(F.col("identifier").isNull(), 1).otherwise(0)),
                F.lit(0),
            ).alias("value"),
        )
    )

    caches = [enriched, email_rows, phone_rows]
    return link_candidates, contacts, drop_metrics, caches


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
