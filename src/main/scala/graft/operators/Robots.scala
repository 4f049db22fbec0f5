package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** robots.txt parsing and URL admission — the crawl-politeness step that
  * sits next to the domain blocklist in a web-curation pipeline
  * (reference behavior: the fetch-layer politeness the engine-side
  * pipeline must be able to REPLAY over an already-captured crawl, e.g.
  * to re-filter a WARC corpus with today's rules).
  *
  * Semantics implemented (the 1994 REP core + the group/precedence rules
  * of RFC 9309): `User-agent` lines open a group (consecutive UA lines
  * share one group); `Allow`/`Disallow` rules bind to their group; a
  * fetcher obeys the groups naming it exactly, falling back to `*`
  * groups only when no exact group exists; the longest matching path
  * prefix wins, ties go to Allow; an empty Disallow value or no matching
  * rule means allowed. Wildcard (`*`, `$`) path patterns are out of
  * scope (documented subset: plain prefix match — the original spec).
  *
  * Scale: parsing is per-domain line explode + one bounded window
  * (robots.txt is capped at 500 KiB by convention, so a per-domain
  * window is a few thousand rows at worst); admission is one equi-join
  * of the URL corpus against the per-domain rule table (broadcast when
  * small) — never a regex-per-rule scan of the corpus.
  */
object Robots {

  /** Parse (domain, robots.txt) rows into one row per directive:
    * (domain, line_idx, group_id, kind, value) where kind ∈
    * {user-agent, allow, disallow}, value is the trimmed payload
    * (lowercased for user-agent), comments stripped. group_id numbers
    * groups per domain in file order starting at 1; a run of
    * consecutive `User-agent` lines shares the group of the rules that
    * follow it.
    */
  def parseRobots(df: DataFrame, domainCol: Column, txtCol: Column): DataFrame = {
    val lines = df.select(lower(domainCol).as("domain"),
        posexplode(split(coalesce(txtCol, lit("")), "\n"))
          .as(Seq("line_idx", "raw")))
      .select(col("domain"), col("line_idx"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("line"))
      .filter(col("line") =!= "")
    val keyed = lines.select(col("domain"), col("line_idx"),
        lower(trim(regexp_extract(col("line"), "^([^:]+):", 1))).as("kind"),
        trim(regexp_extract(col("line"), "^[^:]+:(.*)$", 1)).as("value"))
      .filter(col("kind").isin("user-agent", "allow", "disallow"))
    // a UA line starts a new group unless the previous directive was
    // also a UA line (consecutive UA lines share the group they head)
    val w = Window.partitionBy("domain").orderBy("line_idx")
    val starts = keyed.withColumn("__prev_kind", lag(col("kind"), 1).over(w))
      .withColumn("__start",
        (col("kind") === "user-agent" &&
          (col("__prev_kind").isNull || col("__prev_kind") =!= "user-agent"))
          .cast("int"))
    starts.withColumn("group_id",
        sum(col("__start")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("domain"), col("line_idx"), col("group_id"),
        col("kind"),
        when(col("kind") === "user-agent", lower(col("value")))
          .otherwise(col("value")).as("value"))
  }

  /** Admission verdicts for a URL corpus against parsed robots rules.
    *
    * `robots`: (domain, robots_txt) raw files. Every input row survives
    * with (allowed, matched_kind, matched_path) audit columns — callers
    * filter `allowed` or inspect the match. URLs whose host has no
    * robots row (or no applicable group) are allowed, per spec.
    */
  def robotsFilter(urls: DataFrame, idCol: Column, urlCol: Column,
                   robots: DataFrame, agent: String,
                   broadcastRules: Boolean = true): DataFrame = {
    val directives = parseRobots(robots, col("domain"), col("robots_txt"))
    val agents = directives.filter(col("kind") === "user-agent")
      .select(col("domain"), col("group_id"), col("value").as("agent"))
    // exact-agent groups shadow '*' groups per domain (RFC 9309 §2.2.1)
    val hasExact = agents.filter(col("agent") === agent.toLowerCase)
      .select(col("domain")).distinct().withColumn("__exact", lit(true))
    val chosenGroups = agents.join(hasExact, Seq("domain"), "left")
      .filter(when(col("__exact"), col("agent") === agent.toLowerCase)
        .otherwise(col("agent") === "*"))
      .select(col("domain"), col("group_id")).distinct()
    val rules0 = directives.filter(col("kind") =!= "user-agent")
      .join(chosenGroups, Seq("domain", "group_id"))
      .filter(col("value") =!= "") // empty Disallow == allow-all: no rule
      .select(col("domain"), col("kind").as("rule_kind"),
        col("value").as("rule_path"))
    val rules = if (broadcastRules) broadcast(rules0) else rules0
    val stripped = regexp_replace(urlCol,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    val base = urls.select(idCol.as("doc_id"), urlCol.as("url"),
      TextAnalysis.urlHost(urlCol).as("host"),
      // path (+ query) the rules match against; missing path == '/'
      when(stripped === "", "/").otherwise(stripped).as("path"))
    // longest matching prefix wins; on equal length Allow beats
    // Disallow (RFC 9309 §2.2.2) — encoded as (len, is_allow) struct max.
    // Hits key on (doc_id, url), not doc_id alone: callers may legally
    // pass several URLs under one id (q238's frontier keeps the MIN
    // discovering doc per canonical URL), and a doc-keyed verdict would
    // leak one URL's Disallow onto its siblings (round-10 review find)
    val hits = base.join(rules, base("host") === rules("domain"))
      .filter(col("path").startsWith(col("rule_path")))
      .groupBy(col("doc_id"), col("url"))
      .agg(max(struct(length(col("rule_path")).as("l"),
          (col("rule_kind") === "allow").cast("int").as("a"),
          col("rule_kind").as("k"), col("rule_path").as("p")))
        .as("__best"))
      .select(col("doc_id"), col("url"), col("__best.k").as("matched_kind"),
        col("__best.p").as("matched_path"))
    base.join(hits, Seq("doc_id", "url"), "left")
      .select(col("doc_id"), col("url"), col("host"), col("path"),
        (col("matched_kind").isNull || col("matched_kind") === "allow")
          .as("allowed"),
        col("matched_kind"), col("matched_path"))
  }
}
