package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-snapshot operators — the incremental-ingestion layer between
  * raw WARC scans ([[graft.sources.Warc]]) and the curation pipeline.
  *
  * The 100 TB motivation: a monthly crawl re-fetches mostly-unchanged
  * pages; re-running dedup/quality/decontamination over the full
  * snapshot every time is the single largest avoidable bill in a
  * recurring pipeline. Keying pages by canonical URL and diffing
  * content fingerprints shrinks "this month's work" to the
  * added+changed slice — typically a small fraction — while `removed`
  * feeds index tombstones ([[Dedup]] / [[graft.operators.TextIndex]]
  * `remove`).
  */
object Crawl {

  /** Diff two crawl snapshots keyed by URL (pre-canonicalize with
    * [[graft.functions.TextFns.urlCanonicalize]] — byte-distinct
    * equivalent URLs would otherwise report as a remove+add pair).
    *
    * Returns one row per URL in either snapshot with `status`:
    * `added` (new URL), `removed` (gone), `changed` (fingerprint
    * differs), `unchanged`. Fingerprints are caller-chosen (content
    * hash, simhash…); null fingerprints compare as distinct-from-
    * everything EXCEPT another null (two missing bodies are not a
    * change signal). Duplicate URLs within one snapshot must be
    * resolved upstream (one-row-per-key is the contract; the join
    * would otherwise fan out) — `requireUniqueKeys` guards it loudly
    * on by default, costing one count aggregate per side.
    *
    * Shape: ONE full shuffle join on the URL key and nothing else —
    * both sides partition by the same key, no broadcast of corpus-
    * sized relations, no window. Output carries both fingerprints so
    * downstream can route (e.g. `changed` into re-dedup, `removed`
    * into tombstones) without re-joining the snapshots.
    */
  def crawlDelta(oldSnap: DataFrame, newSnap: DataFrame,
      urlCol: String, fpCol: String,
      requireUniqueKeys: Boolean = true): DataFrame = {
    def prep(df: DataFrame, side: String) = {
      if (requireUniqueKeys) {
        val dup = df.groupBy(col(urlCol)).count()
          .filter(col("count") > 1).limit(1).collect()
        require(dup.isEmpty,
          s"$side snapshot has duplicate $urlCol (e.g. ${dup.headOption
            .map(_.get(0)).getOrElse("")}) — resolve to one row per key " +
            "first (keep-best, latest-fetch…)")
      }
      // explicit presence markers: a null FINGERPRINT on a present row
      // must not read as absence (null fp vs null fp is `unchanged`)
      df.select(col(urlCol).as("url"), col(fpCol).as(s"fp_$side"),
        lit(1).as(s"__in_$side"))
    }
    val o = prep(oldSnap, "old")
    val n = prep(newSnap, "new")
    o.join(n, Seq("url"), "full_outer")
      .select(col("url"), col("fp_old"), col("fp_new"),
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(col("fp_old") <=> col("fp_new"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Main-content extraction — the jusText/Readability core idea as a
    * deterministic, oracle-checkable rule: segment the page into
    * BLOCKS at block-level tag boundaries (script/style/comment
    * content removed first), score each block by visible-text length
    * and LINK density, and keep blocks that read like prose —
    * `length(text) >= minChars` and
    * `100·(anchor-text length) <= maxLinkPct·length(text)` (integer
    * cross-multiplication, no float ratio). Navigation bars and
    * footers are link-dense and short; article paragraphs are neither
    * — that asymmetry is the entire classifier, and it is the step
    * C4-style pipelines run between raw HTML and line-level rules.
    *
    * Shape: blocks EXPLODE to rows so the regex work runs codegen'd
    * per row (not interpreted per array element), then one per-doc
    * rebuild — `sort_array(collect_list(struct(pos, txt)))` — exactly
    * the lineDedup rebuild pattern. Docs with no surviving block are
    * absent from the result (join back if presence matters).
    */
  def mainContent(pages: DataFrame, idCol: String, htmlCol: String,
      minChars: Int = 25, maxLinkPct: Int = 30): DataFrame = {
    import graft.functions.TextFns
    require(minChars >= 1 && maxLinkPct >= 0 && maxLinkPct <= 100,
      s"minChars=$minChars maxLinkPct=$maxLinkPct out of range")
    val stripped = regexp_replace(
      regexp_replace(
        regexp_replace(col(htmlCol),
          "(?is)<script[^>]*>.*?</script[ \t]*>", ""),
        "(?is)<style[^>]*>.*?</style[ \t]*>", ""),
      "(?s)<!--.*?-->", "")
    val blockTag = "(?i)</?(?:p|div|h[1-6]|li|tr|td|ul|ol|table|" +
      "section|article|aside|nav|footer|header|blockquote|pre|br|" +
      "html|head|body|title)[^>]*>"
    val ex = pages
      .select(col(idCol).as("__id"),
        posexplode(split(stripped, blockTag)).as(Seq("__pos", "__b")))
      .select(col("__id"), col("__pos"),
        TextFns.htmlFragmentText(col("__b")).as("__txt"),
        aggregate(
          regexp_extract_all(col("__b"), lit(TextFns.anchorPattern),
            lit(2)),
          lit(0),
          (acc, t) => acc + length(TextFns.htmlFragmentText(t)))
          .as("__ll"))
    ex.filter(length(col("__txt")) >= minChars &&
        col("__ll") * 100 <= length(col("__txt")) * maxLinkPct)
      .groupBy(col("__id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__pos"), col("__txt")))),
          s => s.getField("__txt")), "\n").as("content"))
      .withColumnRenamed("__id", idCol)
  }

  /** Parse per-host `robots.txt` bodies into the rule relation the
    * crawl filter consumes — Robots Exclusion Protocol (RFC 9309)
    * group semantics:
    *
    *  - lines are `Field: value` with `#`-comments stripped, field
    *    names case-insensitive;
    *  - a GROUP is a run of consecutive `User-agent` lines plus the
    *    `Allow`/`Disallow` lines after it (up to the next run);
    *  - group selection for `userAgent`: if ANY group names the agent
    *    (case-insensitive product token), the union of those groups'
    *    rules applies and `*` groups are IGNORED; otherwise the `*`
    *    groups apply; a host with neither contributes no rules
    *    (everything allowed);
    *  - empty-value `Disallow:` lines match nothing and are dropped
    *    (the RFC's "allow all" idiom).
    *
    * Returns `(host, rule_path, allow)`. All windows partition by
    * host — a robots body is small by protocol, so per-host line
    * numbering never concentrates a partition.
    */
  /** Shared RFC 9309 group machinery: clean/split lines, cut
    * consecutive User-agent runs into groups, select the groups
    * binding `ua` (exact product token shadows `*`), and return the
    * non-User-agent field lines of the selected groups as
    * `(host, __f, __v)` — `fields` filters which record fields survive
    * (always includes user-agent for the grouping itself).
    */
  private def selectedGroupFields(robots: DataFrame, hostCol: String,
      textCol: String, ua: String, fields: Seq[String]): DataFrame = {
    val lines = robots
      .select(col(hostCol).as("host"),
        posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__l")))
      .select(col("host"), col("__pos"),
        trim(regexp_replace(regexp_replace(col("__l"), "\r", ""),
          "#.*$", "")).as("__l"))
      .filter(col("__l") =!= "")
      .select(col("host"), col("__pos"),
        lower(trim(regexp_extract(col("__l"),
          "^([A-Za-z-]+)[ \t]*:", 1))).as("__f"),
        trim(regexp_extract(col("__l"),
          "^[A-Za-z-]+[ \t]*:(.*)$", 1)).as("__v"))
      .filter(col("__f").isin("user-agent" +: fields: _*))
    val w = Window.partitionBy(col("host")).orderBy(col("__pos"))
    val grouped = lines
      .withColumn("__ua", (col("__f") === "user-agent").cast("int"))
      .withColumn("__newGroup",
        (col("__ua") === 1 &&
          coalesce(lag(col("__ua"), 1).over(w), lit(0)) === 0).cast("int"))
      .withColumn("__gid", sum(col("__newGroup")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("__gid") > 0) // rules before any User-agent line: dropped
    val groups = grouped.filter(col("__ua") === 1)
      .groupBy(col("host"), col("__gid"))
      .agg(max((lower(col("__v")) === ua).cast("int")).as("__exact"),
        max((col("__v") === "*").cast("int")).as("__star"))
    val hostHasExact = groups.groupBy(col("host"))
      .agg(max(col("__exact")).as("__hostExact"))
    val selected = groups.join(hostHasExact, Seq("host"))
      .filter(when(col("__hostExact") === 1, col("__exact") === 1)
        .otherwise(col("__star") === 1))
      .select(col("host"), col("__gid"))
    grouped.filter(col("__ua") === 0 && col("__v") =!= "")
      .join(selected, Seq("host", "__gid"))
      .select(col("host"), col("__f"), col("__v"))
  }

  def parseRobots(robots: DataFrame, hostCol: String, textCol: String,
      userAgent: String): DataFrame =
    selectedGroupFields(robots, hostCol, textCol, userAgent.toLowerCase,
        Seq("allow", "disallow"))
      .select(col("host"), col("__v").as("rule_path"),
        (col("__f") === "allow").as("allow"))

  /** Per-host `Crawl-delay` (the de-facto extension Bing/Yandex honor)
    * under the same RFC 9309 group-selection semantics as
    * [[parseRobots]]: the binding groups' maximum delay wins (the
    * conservative read when several selected groups disagree).
    * Fractional delays — `Crawl-delay: 1.5` is common in the wild —
    * parse as DOUBLE and round UP to whole seconds (the conservative
    * read again: never under-throttle). Malformed, negative, and
    * absurd (> 10^15 s, incl. inf/nan) values are ignored; hosts with
    * no binding delay are absent (callers supply their default).
    */
  def crawlDelays(robots: DataFrame, hostCol: String, textCol: String,
      userAgent: String): DataFrame =
    selectedGroupFields(robots, hostCol, textCol, userAgent.toLowerCase,
        Seq("crawl-delay"))
      .filter(col("__f") === "crawl-delay")
      .withColumn("__d", expr("try_cast(__v AS DOUBLE)"))
      .filter(col("__d").isNotNull && col("__d") >= 0 &&
        col("__d") <= 1e15)
      .groupBy(col("host"))
      .agg(ceil(max(col("__d"))).cast("long").as("delay"))

  /** Politeness fetch schedule: per host, URLs get slots in a
    * deterministic (url) order and `fetch_at = slot · delay` (the
    * host's [[crawlDelays]] row, else `defaultDelay`) — the per-host
    * serialization a polite fetcher enforces, precomputed so workers
    * can pull (host, slot) batches. Windows are host-partitioned (a
    * host's frontier is bounded by politeness itself — a 10⁶-URL host
    * at 1 req/s is 11 days of crawl; re-shard the frontier upstream
    * before that).
    */
  def fetchSchedule(urls: DataFrame, urlCol: String, delays: DataFrame,
      defaultDelay: Long): DataFrame = {
    require(defaultDelay >= 0, s"defaultDelay=$defaultDelay")
    import graft.functions.TextFns
    val byHost = Window.partitionBy(col("host")).orderBy(col("url"))
    urls.select(col(urlCol).as("url"))
      .withColumn("host", TextFns.urlHost(col("url")))
      .join(delays, Seq("host"), "left_outer")
      .withColumn("delay", coalesce(col("delay"), lit(defaultDelay)))
      .withColumn("slot", row_number().over(byHost).cast("long") - 1L)
      .withColumn("fetch_at", col("slot") * col("delay"))
      .select(col("url"), col("host"), col("delay"), col("slot"),
        col("fetch_at"))
  }

  /** Annotate URLs with the REP verdict against a parsed rule relation
    * ([[parseRobots]]): per URL, the matching rule with the LONGEST
    * `rule_path` wins, `allow` wins length ties, no match ⇒ allowed
    * (and a host with no rules at all ⇒ allowed). Rule paths support
    * the REP wildcards — `*` spans any text, a trailing `$` anchors
    * the end — compiled to SQL LIKE patterns (`%`/`_`/`\` in paths
    * escaped) evaluated as non-foldable patterns inside codegen;
    * everything else is one shuffle join on the host key (rules are
    * per-host-small but corpus-wide-many: never broadcast) plus a
    * per-URL window over its few matching rules.
    */
  def robotsAllowed(urls: DataFrame, urlCol: String,
      rules: DataFrame): DataFrame = {
    import graft.functions.TextFns
    val pat = {
      val esc = regexp_replace(regexp_replace(regexp_replace(
        col("rule_path"), "\\\\", "\\\\\\\\"),
        "%", "\\\\%"), "_", "\\\\_")
      val anchored = when(esc.endsWith("$"),
          expr("substring(__e, 1, length(__e) - 1)"))
        .otherwise(concat(expr("__e"), lit("*")))
      // robots '*' -> LIKE '%', after escaping LIKE's own wildcards
      rules.select(col("host").as("__rh"), col("rule_path"),
          col("allow"), esc.as("__e"))
        .select(col("__rh"), col("rule_path"), col("allow"),
          regexp_replace(anchored, "\\*", "%").as("__pat"))
    }
    val pathEx = regexp_extract(col(urlCol),
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^#]*)", 1)
    val keyed = urls
      .withColumn("__rid", monotonically_increasing_id())
      .withColumn("__uh", TextFns.urlHost(col(urlCol)))
      .withColumn("__up",
        when(pathEx === "", lit("/")).otherwise(pathEx))
    val matched = keyed.join(pat,
      keyed("__uh") === pat("__rh") &&
        expr(raw"__up LIKE __pat ESCAPE '\\'"),
      "left_outer")
    // verdict per ROW (not per distinct url — duplicates survive):
    // max over (path length, allow) structs = longest match, allow
    // winning ties; no match aggregates to null = allowed
    matched.groupBy(keyed.columns.map(col): _*)
      .agg(max(struct(length(col("rule_path")).as("l"),
        col("allow").as("a"))).as("__best"))
      .select(keyed.columns.filterNot(_.startsWith("__")).map(col) :+
        coalesce(col("__best.a"), lit(true)).as("allowed"): _*)
  }

  /** Recrawl scheduling from observation history — the policy half of
    * [[crawlDelta]]: pages that change often get revisited soon, stable
    * pages age out to the cold tier, so a recurring crawl spends its
    * fetch budget where the content moves. Input is one row per
    * (url, fetch) with a content fingerprint; per URL the change count
    * is the number of consecutive-fetch fingerprint transitions
    * (ordered by `ts`, ties by fingerprint — a URL's observations are
    * a bounded window partition, never corpus-wide).
    *
    * Tier rule (integer cross-multiplication, no float rates):
    * `hot` when `changes·100 ≥ hotPct·(n_obs−1)` with ≥ 2
    * observations, else `warm` at `warmPct`, else `cold`;
    * single-observation URLs are `cold` (no signal yet). The next
    * visit is `last_ts + interval(tier)` in the caller's clock units.
    */
  def recrawlSchedule(obs: DataFrame, urlCol: String, tsCol: String,
      fpCol: String, hotPct: Int = 50, warmPct: Int = 10,
      hotEvery: Long, warmEvery: Long, coldEvery: Long): DataFrame = {
    require(hotPct > warmPct && warmPct > 0,
      s"need hotPct > warmPct > 0, got $hotPct/$warmPct")
    require(hotEvery <= warmEvery && warmEvery <= coldEvery,
      "intervals must be hot <= warm <= cold")
    val byUrl = Window.partitionBy(col("url"))
      .orderBy(col("ts"), col("fp"))
    val prev = lag(col("fp"), 1).over(byUrl)
    val agg = obs.select(col(urlCol).as("url"),
        col(tsCol).cast("long").as("ts"), col(fpCol).cast("long").as("fp"))
      .withColumn("__chg",
        when(prev.isNotNull && col("fp") =!= prev, lit(1L))
          .otherwise(lit(0L)))
      .groupBy(col("url"))
      .agg(count(lit(1)).as("n_obs"), sum(col("__chg")).as("n_changes"),
        max(col("ts")).as("last_ts"))
    val tier = when(col("n_obs") >= 2 &&
        col("n_changes") * 100 >= lit(hotPct.toLong) * (col("n_obs") - 1),
        lit("hot"))
      .when(col("n_obs") >= 2 &&
        col("n_changes") * 100 >= lit(warmPct.toLong) * (col("n_obs") - 1),
        lit("warm"))
      .otherwise(lit("cold"))
    agg.withColumn("tier", tier)
      .withColumn("next_visit", col("last_ts") +
        when(col("tier") === "hot", lit(hotEvery))
          .when(col("tier") === "warm", lit(warmEvery))
          .otherwise(lit(coldEvery)))
  }

  /** Sitemap XML extraction — the frontier-seeding counterpart of the
    * robots suite: one row per `<loc>` entry of a sitemap (or sitemap
    * INDEX) document, with `kind` = `url` | `sitemap` (index entries
    * point at MORE sitemaps — feed them back into the fetch queue)
    * and the optional `<lastmod>` (null when absent — the absence IS
    * the signal for "never use lastmod freshness on this host"). The
    * scan is regex-based over `<url>…</url>` / `<sitemap>…</sitemap>`
    * blocks (the practical choice crawlers ship: sitemap XML in the
    * wild is too dirty for a conforming parser, and the engine's
    * WARC/robots readers set the same precedent); entities are NOT
    * decoded beyond `&amp;` — document URLs are expected
    * percent-encoded per the protocol. Entirely codegen'd row-local
    * regex work: one explode, no UDF, no shuffle before the caller's
    * own aggregation. Documents with no entries emit nothing.
    *
    * GZIPPED sitemaps (`.xml.gz`, the dominant wire form for index
    * members): inflate the fetched binary payload in-plan with
    * [[graft.expr.GraftExpressions.gunzipText]] and feed the text
    * column here — the inflate stays inside codegen next to the regex
    * scan, refusing loudly on non-gzip bytes and decompression bombs
    * (CrawlSpec pins the round-trip).
    */
  def sitemapUrls(df: DataFrame, idCol: String,
      xmlCol: String): DataFrame = {
    def blocks(tag: String, kind: String) = df.select(
      col(idCol).as("doc"), lit(kind).as("kind"),
      explode(expr(
        s"regexp_extract_all(`$xmlCol`, '(?s)<$tag>(.*?)</$tag>', 1)"))
        .as("__b"))
    blocks("url", "url").unionByName(blocks("sitemap", "sitemap"))
      .select(col("doc"), col("kind"),
        regexp_replace(regexp_extract(col("__b"),
          "(?s)<loc>\\s*(.*?)\\s*</loc>", 1), "&amp;", "&").as("loc"),
        when(col("__b").rlike("(?s)<lastmod>"),
          regexp_extract(col("__b"),
            "(?s)<lastmod>\\s*(.*?)\\s*</lastmod>", 1))
          .otherwise(lit(null).cast("string")).as("lastmod"))
      .filter(col("loc") =!= "")
  }
}
