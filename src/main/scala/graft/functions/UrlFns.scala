package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl-dedup staple: the same resource
  * arrives under scheme/host case variants, explicit default ports,
  * trailing slashes, tracking parameters and shuffled query order,
  * and a crawler that dedups on the RAW url re-fetches (and a corpus
  * that dedups on it under-merges). One canonical form per resource
  * makes url equality the dedup key.
  *
  * Rules (the conservative, loss-free subset every normalizer agrees
  * on): lowercase scheme and host; drop the port when it is the
  * scheme default (http:80 / https:443); strip trailing slashes from
  * the path; drop `utm_*` tracking parameters; sort the surviving
  * query parameters (order is almost never semantic; sorting makes
  * equality canonical). Everything is Column arithmetic — regexes +
  * array higher-order functions, no UDFs — so it runs map-side at
  * corpus scale and replays in the DuckDB oracle.
  */
object UrlFns {

  /** The canonical form of `url` (absolute, scheme://host[:port]
    * [/path][?query]). Malformed urls (no scheme) canonicalize to
    * their lowercase self — garbage in, stable garbage out. */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1))
    val port = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]+:([0-9]+)", 1)
    val path = regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(/[^?#]*)", 1),
      "/+$", "")
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val keptParams = sort_array(filter(split(query, "&"),
      p => p =!= "" && !p.startsWith("utm_")))
    val defaultPort =
      (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443")
    val portPart = when(port === "" || defaultPort, lit(""))
      .otherwise(concat(lit(":"), port))
    val queryPart = when(size(keptParams) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(keptParams, "&")))
    when(scheme === "", lower(url))
      .otherwise(concat(scheme, lit("://"), host, portPart, path, queryPart))
  }
}
