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
    * drops: a :class:`DropCounters` — exact kept/dropped counts
      (reference counters bc:1238-1241), observed inside the action
      that materializes contacts (no separate aggregation job; call
      ``drops.get()`` only after that action);
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
