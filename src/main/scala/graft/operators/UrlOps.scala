package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL hygiene for web-corpus pipelines (the C4/CCNet curation steps):
  * host extraction, registrable-domain rollup, URL normalization for
  * dedup keys, and domain blocklist filtering.
  *
  * Everything is a pure codegen'd column expression (regexp chains), so
  * all ops run map-side at any scale and are reproducible in any engine
  * with RE2-compatible regex — the oracle property. Spark's `parse_url`
  * would also serve for HOST/QUERY but its edge-case behavior is
  * Hive-defined rather than dictionary-defined; the regex subset below is
  * deliberately engine-portable. */
object UrlOps {

  /** Lowercased host of an http(s) URL; null when no host is present.
    *
    * Repeated subterms here and below are bound once with `let1` rather
    * than inlined: these ops compose (normalize(host(url)) etc.), and
    * naive inlining multiplies the caller's url expression through every
    * regexp stage — q89c's 4-column projection hit janino's 64 KB method
    * limit (1097 codegen references) and silently ran interpreted. */
  def urlHost(url: Column): Column =
    graft.functions.ibisfn.let1(
      regexp_replace(
        element_at(split(
          lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)),
          "@"), -1),
        ":[0-9]+$", "")) { noPort =>
      when(length(noPort) > 0, noPort)
    }

  /** Two-level suffixes where the registrable domain needs THREE labels
    * (the common public-suffix cases; the full PSL is a data file real
    * deployments would load the same way). */
  private val TwoLevelTlds = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "com.tw", "com.sg", "co.nz")

  /** Registrable domain (eTLD+1 against the builtin suffix table):
    * "a.b.example.co.uk" → "example.co.uk", "www.example.com" →
    * "example.com". Hosts with fewer labels pass through unchanged; a
    * null host yields null (NOT "" — `concat_ws` would otherwise swallow
    * the nulls and collapse every unparseable host onto one key, which
    * both breaks dedup grouping and defeats the caller's isNull guard). */
  def registrableDomain(host: Column): Column =
    graft.functions.ibisfn.let1(host) { h =>
      graft.functions.ibisfn.let1(split(h, "\\.")) { parts =>
        // the binding is EAGER (unlike a when-branch), so guard the
        // negative indexing for 1-label hosts (ANSI element_at throws)
        graft.functions.ibisfn.let1(
          when(size(parts) >= 2,
            concat_ws(".", element_at(parts, -2), element_at(parts, -1)))) { last2 =>
          val n = size(parts)
          val last3 = concat_ws(".", element_at(parts, -3), last2)
          val twoLevel = array(TwoLevelTlds.map(lit): _*)
          when(h.isNull, lit(null).cast("string"))
            .when(n <= 2, h)
            .when(array_contains(twoLevel, last2) && n >= 3, last3)
            .otherwise(last2)
        }
      }
    }

  /** Canonical URL for exact-dedup keys: lowercase scheme+host, default
    * ports dropped, tracking params (utm_*, fbclid, gclid, msclkid, ref)
    * removed, fragment removed, trailing "?"/"&" and trailing slash on a
    * bare path dropped. A value with no `scheme://` prefix passes through
    * unchanged (NOT "" — two no-match extracts would otherwise collapse
    * every scheme-less value onto one dedup key). One regexp chain —
    * map-side. */
  def urlNormalize(url: Column): Column = graft.functions.ibisfn.let1(url) { u =>
    // lowercase scheme and authority (path/query keep their case)
    val lowered = concat(
      lower(regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)),
      regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$", 1))
    val noFrag = regexp_replace(lowered, "#.*$", "")
    // no lookahead (RE2-portable): capture the delimiter — or end — instead
    val noP443 = regexp_replace(noFrag, "^(https://[^/?#:]+):443([/?]|$)", "$1$2")
    val noDefPort = regexp_replace(noP443, "^(http://[^/?#:]+):80([/?]|$)", "$1$2")
    // tracking params: &-separated ones drop outright; a ?-leading one
    // hands its "?" to the next param (or drops it when last)
    val trk = "(utm_[a-z]+|fbclid|gclid|msclkid|ref)=[^&#]*"
    val noTrackAmp = regexp_replace(noDefPort, "&" + trk, "")
    val noTrackQMid = regexp_replace(noTrackAmp, "\\?" + trk + "&", "?")
    val noTrackQEnd = regexp_replace(noTrackQMid, "\\?" + trk + "$", "")
    val noTrail = regexp_replace(noTrackQEnd, "[?&]$", "")
    val normalized =
      regexp_replace(noTrail, "^([a-z][a-z0-9+.-]*://[^/?#]+)/$", "$1")
    when(regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*://)", 1) === "", u)
      .otherwise(normalized)
  }

  /** Keep rows whose registrable domain is NOT in the blocklist. The list
    * ships as a broadcast literal array (blocklists are thousands of
    * entries — plan-literal scale); rows with no parseable host are kept
    * (policy: unparseable ≠ blocked). Map-side, no shuffle. */
  def filterBlockedDomains(df: DataFrame, url: Column, blocked: Seq[String]): DataFrame = {
    require(blocked.nonEmpty, "blocklist must be non-empty")
    val keep = graft.functions.ibisfn.let1(registrableDomain(urlHost(url))) { dom =>
      dom.isNull || !array_contains(array(blocked.map(lit): _*), dom)
    }
    df.filter(keep)
  }

  /** Per-registrable-domain corpus stats: document count plus any caller
    * aggregates — the "inspect your top domains" curation step. ONE hash
    * aggregation on the domain key. */
  def domainStats(df: DataFrame, url: Column, aggs: Seq[Column] = Seq.empty): DataFrame = {
    val base = df.groupBy(registrableDomain(urlHost(url)).as("domain"))
    if (aggs.isEmpty) base.agg(count(lit(1)).as("n_docs"))
    else base.agg(count(lit(1)).as("n_docs"), aggs: _*)
  }
}
