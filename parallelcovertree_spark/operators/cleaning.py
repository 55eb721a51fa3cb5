"""Text-cleaning operators (training-pipeline surface): PII scrubbing and
CCNet-style shared-paragraph removal.

Both stay entirely JVM-side (codegen regex / explode / hash-agg) — no Python
in the hot path — and both are deterministic functions of the input so the
driver gates replay them exactly in DuckDB.

- **PII scrub**: mask email addresses and phone-shaped tokens with typed
  placeholder tags and count the masks per document. One projection pass
  over the corpus: `regexp_replace`/`regexp_count` inside the scan stage, no
  shuffle at all. The regexes live in the Java-regex ∩ RE2 dialect subset so
  the DuckDB oracle applies the *identical* pattern strings.

- **Paragraph dedup** (the CCNet/RefinedWeb boilerplate-removal pass): split
  each document into lines, compute each line's document frequency across
  the corpus, drop lines occurring in more than ``max_df`` distinct
  documents (nav bars, cookie banners, copyright footers), and reassemble
  the survivors in original order. Scale shape: the df-aggregate and the
  re-join key on the sha2-256 line digest (32 B), never the line text; the
  hot boilerplate keys are exactly the ones the aggregate's map-side
  partials collapse, and the digest join's build side is one row per
  distinct line, so skew is bounded by construction. Docs whose every line
  is boilerplate survive with empty text (left join back to the doc spine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Shared Java-regex ∩ RE2 patterns (identical strings on both engines; no
# backslash-escape divergence because the Spark side binds them through the
# DataFrame API, not SQL literals, and DuckDB literals are escape-free).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b555-[0-9]{4}\b"
EMAIL_TAG = "<EMAIL>"
PHONE_TAG = "<PHONE>"


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, text_clean, n_emails, n_phones) — masked text plus mask counts.

    Single narrow projection (no shuffle): counts are taken from the raw
    text, then both patterns are replaced. Email masking runs first so a
    phone-shaped substring inside an address can't double-mask; the count
    columns are audit metrics (how much PII the corpus carried), which a
    pipeline aggregates per source/language downstream.
    """
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, EMAIL_TAG), PHONE_RE, PHONE_TAG
        ).alias("text_clean"),
        F.regexp_count(t, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RE)).alias("n_phones"),
    )


def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int = 5,
    sep: str = "\n",
) -> DataFrame:
    """(id, text_clean, n_kept, n_total) — drop lines shared by more than
    ``max_df`` distinct documents, keep per-doc line order.

    The mechanism CCNet applies at paragraph granularity: content repeated
    across many pages is boilerplate (navigation, cookie banners, legal
    footers), content unique to a page is the document. ``max_df`` is the
    distinct-document threshold — a line must appear in MORE than ``max_df``
    docs to be dropped, so genuine near-duplicate bodies below the threshold
    survive for the dedup operators to handle.

    Three stages, all keyed on the 32-byte sha2 digest of the line (line
    text itself never shuffles twice): explode → df-aggregate (map-side
    partials absorb the hot boilerplate keys) → digest equi-join + ordered
    reassembly. The doc spine left-join keeps fully-boilerplate docs as
    empty strings (n_kept = 0) rather than silently dropping rows.
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    ).withColumn("line_key", F.sha2(F.col("line"), 256))

    line_df = lines.groupBy("line_key").agg(
        F.countDistinct(id_col).alias("line_docs")
    )

    # one grouped pass computes survivors AND totals (collect_list drops the
    # NULLs the `when` emits for boilerplate lines, so fully-boilerplate docs
    # come out as empty strings without an outer-join branch — and the input
    # is scanned twice, not three times)
    keep = F.col("line_docs") <= max_df
    return (
        lines.join(line_df, "line_key")
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(keep, F.struct(F.col("pos"), F.col("line")))
                        )
                    ),
                    lambda s: s.getField("line"),
                ),
                sep,
            ).alias("text_clean"),
            F.count(F.when(keep, 1)).alias("n_kept"),
            F.count("*").alias("n_total"),
        )
    )


# URL canonicalization (the dedup-key normalization every web pipeline runs
# before exact/host-level dedup). Shared Java-regex ∩ RE2 patterns; the
# Spark side binds them through the DataFrame API (no SQL-literal escape
# divergence), the DuckDB oracle uses raw-escape literals with the 'g' flag
# to match Spark's replace-all semantics.
URL_PREFIX_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"  # scheme://host[:port]
URL_FRAG_RE = "#.*$"
URL_UTM_MID_RE = "&utm_[^&]*"          # non-first utm_* params
URL_UTM_FIRST_RE = r"\?utm_[^&]*&"     # first utm_* param with a successor
URL_UTM_LONE_RE = r"\?utm_[^&]*$"      # utm_* as the only query param
URL_HOST_RE = "://(.*)"


def url_normalize(
    docs: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """(id, url_norm, host) — canonical URL + registrable host per doc.

    Rules (the portable core of web-crawl canonicalization): lowercase
    scheme and host, drop the scheme's default port (:80 / :443), strip the
    fragment, strip utm_* tracking params (first, middle, or lone position —
    separator repair without backreferences, so the identical patterns run
    on both engines). Pure codegen projection — no shuffle, no UDF.
    """
    u = F.regexp_replace(F.col(url_col), URL_FRAG_RE, "")
    prefix = F.regexp_extract(u, URL_PREFIX_RE, 0)
    rest = u.substr(F.length(prefix) + F.lit(1), F.lit(1_000_000))
    low = F.lower(prefix)
    lowp = (
        F.when(low.startswith("http://"), F.regexp_replace(low, ":80$", ""))
        .when(low.startswith("https://"), F.regexp_replace(low, ":443$", ""))
        .otherwise(low)
    )
    joined = F.concat(lowp, rest)
    joined = F.regexp_replace(joined, URL_UTM_MID_RE, "")
    joined = F.regexp_replace(joined, URL_UTM_FIRST_RE, "?")
    joined = F.regexp_replace(joined, URL_UTM_LONE_RE, "")
    return docs.select(
        F.col(id_col),
        joined.alias("url_norm"),
        F.regexp_extract(lowp, URL_HOST_RE, 1).alias("host"),
    )


def url_normalize_oracle_sql(url_expr: str, id_expr: str = "doc_id") -> str:
    """The DuckDB replay of :func:`url_normalize` over ``url_expr``."""
    stripped = f"regexp_replace({url_expr}, '#.*$', '', 'g')"
    prefix = f"regexp_extract({stripped}, '{URL_PREFIX_RE}', 0)"
    rest = f"substring({stripped}, length({prefix}) + 1)"
    lowp = (
        f"CASE WHEN lower({prefix}) LIKE 'http://%' "
        f"THEN regexp_replace(lower({prefix}), ':80$', '', 'g') "
        f"WHEN lower({prefix}) LIKE 'https://%' "
        f"THEN regexp_replace(lower({prefix}), ':443$', '', 'g') "
        f"ELSE lower({prefix}) END"
    )
    joined = f"({lowp} || {rest})"
    joined = f"regexp_replace({joined}, '&utm_[^&]*', '', 'g')"
    joined = f"regexp_replace({joined}, '\\?utm_[^&]*&', '?', 'g')"
    joined = f"regexp_replace({joined}, '\\?utm_[^&]*$', '', 'g')"
    return (
        f"SELECT {id_expr}, {joined} AS url_norm, "
        f"regexp_extract({lowp}, '://(.*)', 1) AS host"
    )


__all__ = [
    "EMAIL_RE",
    "EMAIL_TAG",
    "PHONE_RE",
    "PHONE_TAG",
    "URL_FRAG_RE",
    "URL_HOST_RE",
    "URL_PREFIX_RE",
    "URL_UTM_FIRST_RE",
    "URL_UTM_LONE_RE",
    "URL_UTM_MID_RE",
    "paragraph_dedup",
    "pii_scrub",
    "url_normalize",
    "url_normalize_oracle_sql",
]
