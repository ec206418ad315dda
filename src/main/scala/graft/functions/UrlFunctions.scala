package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the first normalization pass of web-crawl
  * curation: exact dedup over RAW urls is nearly useless (scheme case,
  * `www.`, default ports, `/index.html`, tracking params and fragments
  * all alias the same resource); the canonical form is the key every
  * downstream per-host statistic, frontier dedup, and blocklist join
  * uses.
  *
  * Built entirely from codegen'd string expressions (regexp_extract /
  * regexp_replace / higher-order filter) — no UDF, no parse_url (whose
  * engine-specific edge semantics a SQL twin can't replay): every rule
  * is an explicit regex shared verbatim with the oracle, and the whole
  * canonicalization fuses into the scan projection. */
object UrlFunctions {

  /** Registered host of a URL: lowercased authority, `www.` and an
    * explicit default port (`:443` or `:80`) stripped — both alias
    * forms of the same resource unify to one dedup key. */
  def urlHost(url: Column): Column =
    regexp_replace(
      regexp_replace(
        lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1)),
        "^www\\.", ""),
      ":(443|80)$", "")

  /** Canonical form: https scheme, [[urlHost]] authority, path with a
    * trailing `/index.html` collapsed to `/` (empty path → `/`), query
    * restricted to non-tracking params (`utm_*`, `ref=` dropped) in
    * sorted order, fragment dropped. */
  def urlCanonicalize(url: Column): Column = {
    val path0 = regexp_extract(url, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    val path = when(length(path0) === 0, lit("/"))
      .otherwise(regexp_replace(path0, "/index\\.html$", "/"))
    val params = filter(split(regexp_extract(url, "\\?([^#]*)", 1), "&"),
      x => length(x) > 0 &&
        substring(x, 1, 4) =!= lit("utm_") &&
        substring(x, 1, 4) =!= lit("ref="))
    val qs = array_join(array_sort(params), "&")
    concat(lit("https://"), urlHost(url), path,
      when(length(qs) > 0, concat(lit("?"), qs)).otherwise(lit("")))
  }
}
