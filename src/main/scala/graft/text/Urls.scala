package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the key-normalization step ahead of URL-level
  * dedup / frontier dedup in a crawl pipeline (the same URL arrives as
  * `HTTP://Example.com:80/a?utm_source=x#top` and `http://example.com/a`;
  * canonicalize-then-group is the standard fix).
  *
  * The transform is a PINNED sequential rewrite chain (each step one
  * Catalyst `regexp_replace`/`concat` — codegen'd, no custom kernel
  * needed) chosen so DuckDB replays it step for step in the oracle —
  * every pattern avoids the constructs where java.util.regex and RE2
  * diverge (no lookaround, no backreferences in patterns; `$`-anchors
  * only after the trim step has removed any trailing newline):
  *
  *  1. `trim`.
  *  2. lowercase the scheme://authority prefix (`^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*`),
  *     path/query case preserved (paths are case-sensitive; hosts are not).
  *  3. drop the fragment: `(?s)#.*` → ``.
  *  4. drop tracking parameters (`utm_*`, `fbclid`, `gclid`), in this
  *     order: `&`-prefixed occurrences, then a `?`-prefixed occurrence
  *     followed by `&` (keeps `?`), then a `?`-prefixed occurrence at
  *     the end.
  *  5. strip default ports: `:80` for http, `:443` for https, only when
  *     followed by `/`, `?` or end-of-string (so `:8080` is untouched).
  *  6. drop a trailing `?` or `&` run left by step 4.
  *
  * Deliberately NOT done (semantics-changing): percent-decode, duplicate-
  * slash collapse, trailing-slash removal, query-parameter sorting —
  * each can alias distinct resources; add site-specific policy upstream.
  */
object Urls {

  private val Track = "utm_[a-z0-9_]+|fbclid|gclid"

  /** The 6-step pinned chain above. */
  def canonicalize(u: Column): Column = {
    val t = trim(u)
    // step 2: lower() the matched prefix, splice the untouched remainder
    val prefix = regexp_extract(t, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    val lowered = concat(lower(prefix), t.substr(length(prefix) + lit(1), lit(1000000000)))
    val noFrag = regexp_replace(lowered, "(?s)#.*", "")
    val noAmp = regexp_replace(noFrag, s"(?i)&($Track)=[^&#]*", "")
    val noQMid = regexp_replace(noAmp, s"(?i)\\?($Track)=[^&#]*&", "?")
    val noQEnd = regexp_replace(noQMid, s"(?i)\\?($Track)=[^&#]*$$", "")
    val noP80 = regexp_replace(noQEnd, "^(http://[^/:?#]+):80(/|\\?|$)", "$1$2")
    val noP443 = regexp_replace(noP80, "^(https://[^/:?#]+):443(/|\\?|$)", "$1$2")
    regexp_replace(noP443, "[?&]+$", "")
  }

  /** Host of an ALREADY-CANONICAL url (group-1 extract; empty string when
    * the value has no `scheme://host` shape) — the grouping key for
    * host-level rollups. Compose as `host(canonicalize(u))` on raw input.
    */
  def host(u: Column): Column =
    regexp_extract(u, "^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)
}
