package graft.ops

import graft.Corpus
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing and enforcement — the crawl-policy layer the
  * reference delegates to Scrapy (`settings.py:7` ROBOTSTXT_OBEY=True;
  * [[Crawl]] consumes an already-filtered edge set). Here the policy
  * itself is data: per-domain robots.txt TEXT is parsed into
  * (agent, rule, prefix) rows and applied to URLs with the standard
  * longest-prefix-match semantics (RFC 9309 §2.2.2: most specific
  * rule wins; on a length tie, Allow wins).
  *
  * Scale shape: parsing is one scan + explode over lines (robots
  * files are tiny); the rule table is tiny per domain and broadcasts;
  * URLs stream through a broadcast join + per-url argmax — no shuffle
  * carries page payloads.
  */
object Robots {

  /** Deterministic per-domain robots.txt corpus: a blanket-deny
    * googlebot group, then a `*` group that exercises every RFC 9309
    * matching feature — the /p/{k%10} plain-prefix disallow re-allowed
    * by the longer /p/{k%10}{k%10} prefix (§2.2.2 longest-match),
    * a `Disallow: /p/1*{d}$` wildcard+anchor rule that blocks the five
    * /p/1xx pages of the domain, a still-longer
    * `Allow: /p/1{t}*{d}$` that re-allows exactly one of them
    * (§2.2.3 `*`/`$` with the longest-match tiebreak running ACROSS
    * wildcard and literal rules), plus a /private/ deny on even
    * domains. d = k%10 (every page id of domain k ends in d);
    * t = (k/10 + 4) % 10 is a tens digit that occurs among the
    * domain's 1xx ids, so the re-allow provably fires. */
  def robotsTxt(spark: SparkSession): DataFrame =
    spark.range(Corpus.NDomains).select(
      concat(lit("d"), col("id"), lit(".test")).as("domain"),
      concat_ws("\n",
        lit("User-agent: googlebot"),
        lit("Disallow: /"),
        lit(""),
        lit("User-agent: *"),
        concat(lit("Crawl-delay: "), pmod(col("id"), lit(5)) + 1),
        concat(lit("Disallow: /p/"), pmod(col("id"), lit(10))),
        concat(lit("Allow: /p/"), pmod(col("id"), lit(10)),
          pmod(col("id"), lit(10))),
        concat(lit("Disallow: /p/1*"), pmod(col("id"), lit(10)), lit("$")),
        concat(lit("Allow: /p/1"),
          pmod((col("id") / lit(10)).cast("long") + 4, lit(10)),
          lit("*"), pmod(col("id"), lit(10)), lit("$")),
        when(pmod(col("id"), lit(2)) === 0, lit("Disallow: /private/"))
          .otherwise(lit(""))).as("txt"))

  /** RFC 9309 §2.2.3 pattern → anchored regex: regex metacharacters
    * in the rule are escaped, `*` becomes `.*`, and a TRAILING `$`
    * anchors at end-of-path (a `$` anywhere else is literal). The
    * result always carries a `^` anchor, so a plain prefix rule
    * compiles to `^prefix` — identical to startsWith — and the whole
    * rule table goes through ONE matching path. */
  def patternToRegex(p: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val anchored = p.endsWith("$")
    val body = regexp_replace(p, "\\$$", "")
    val escaped = regexp_replace(body, "([.\\[\\]{}()+?^$|\\\\])", "\\\\$1")
    val starred = regexp_replace(escaped, "\\*", ".*")
    concat(lit("^"), starred, when(anchored, lit("$")).otherwise(lit("")))
  }

  /** Parse robots TEXT into (domain, agent, rule, prefix, plen) rows:
    * explode lines with ordinal, split `Directive: value`, and assign
    * each rule line to the most recent `User-agent` group above it
    * (a running max-line window — the grouped-record shape of the
    * file format). */
  def parseRules(robots: DataFrame,
      directives: Seq[String] = Seq("allow", "disallow")): DataFrame = {
    val lines = robots
      .select(col("domain"), posexplode(split(col("txt"), "\n")))
      .toDF("domain", "line_no", "line")
      .withColumn("directive",
        lower(regexp_extract(col("line"), "^([A-Za-z-]+):", 1)))
      .withColumn("value",
        trim(regexp_extract(col("line"), "^[A-Za-z-]+:\\s*(.*)$", 1)))
    val w = Window.partitionBy(col("domain")).orderBy(col("line_no"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grouped = lines.withColumn("agent_line",
      max(when(col("directive") === "user-agent", col("line_no"))).over(w))
    val agents = lines.filter(col("directive") === "user-agent")
      .select(col("domain"), col("line_no").as("agent_line"),
        col("value").as("agent"))
    grouped
      .filter(col("directive").isin(directives: _*) && col("value") =!= "")
      .join(agents, Seq("domain", "agent_line"))
      .select(col("domain"), col("agent"), col("directive").as("rule"),
        col("value").as("prefix"), length(col("value")).as("plen"))
  }

  /** q87: parse the robots corpus, keep the `*` group, and classify
    * every /p/{id} URL of the first 400 pages by RFC 9309 matching:
    * each rule (plain prefix OR `*`/`$` wildcard) compiles to an
    * anchored regex via [[patternToRegex]]; the most specific match
    * wins (longest raw pattern; Allow on ties). Output: per-domain
    * allowed/blocked counts.
    *
    * Scale shape: the rule table stays tiny and broadcasts; URLs
    * stream through the broadcast join. The per-row regex match is
    * fine at this rule count; a 100 TB crawl frontier would compile
    * each domain's handful of patterns once into a combined automaton
    * (same plan shape, cheaper inner loop). */
  def robotsEnforce(spark: SparkSession, sfDir: String): DataFrame = {
    val rules = parseRules(robotsTxt(spark)).filter(col("agent") === "*")
      .select(col("domain"), col("rule"), col("prefix"), col("plen"))
      .withColumn("rx", patternToRegex(col("prefix")))
    val urls = Corpus.webPages(spark, sfDir).filter(col("id") < 400)
      .select(col("id"), col("domain"),
        concat(lit("/p/"), col("id")).as("path"))
    val matched = urls.join(broadcast(rules),
      urls("domain") === rules("domain")
        && regexp_like(urls("path"), rules("rx")), "left")
      .select(urls("id"), urls("domain"), col("rule"), col("plen"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("plen").desc_nulls_last,
        (col("rule") === "allow").desc_nulls_last)
    matched.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .withColumn("allowed",
        col("rule").isNull || col("rule") === "allow")
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"),
        sum(when(col("allowed"), 1L).otherwise(0L)).as("n_allowed"),
        sum(when(!col("allowed"), 1L).otherwise(0L)).as("n_blocked"))
      .orderBy(col("domain"))
  }

  val robotsEnforceSql: String =
    """WITH robots AS (
      |  SELECT 'd' || k || '.test' AS domain,
      |    concat_ws(chr(10),
      |      'User-agent: googlebot', 'Disallow: /', '',
      |      'User-agent: *',
      |      'Crawl-delay: ' || ((k % 5) + 1),
      |      'Disallow: /p/' || (k % 10),
      |      'Allow: /p/' || (k % 10) || (k % 10),
      |      'Disallow: /p/1*' || (k % 10) || '$',
      |      'Allow: /p/1' || (((k // 10) + 4) % 10) || '*' || (k % 10) || '$',
      |      CASE WHEN k % 2 = 0 THEN 'Disallow: /private/' ELSE '' END) AS txt
      |  FROM generate_series(0, 19) AS t(k)),
      |lines AS (
      |  SELECT domain, i AS line_no, ls[i] AS line,
      |    lower(regexp_extract(ls[i], '^([A-Za-z-]+):', 1)) AS directive,
      |    trim(regexp_extract(ls[i], '^[A-Za-z-]+:\s*(.*)$', 1)) AS value
      |  FROM (SELECT domain, string_split(txt, chr(10)) AS ls FROM robots)
      |  CROSS JOIN LATERAL unnest(generate_series(1, len(ls))) AS t(i)),
      |grouped AS (
      |  SELECT *, MAX(CASE WHEN directive = 'user-agent' THEN line_no END)
      |    OVER (PARTITION BY domain ORDER BY line_no
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS agent_line
      |  FROM lines),
      |agents AS (
      |  SELECT domain, line_no AS agent_line, value AS agent
      |  FROM lines WHERE directive = 'user-agent'),
      |rules AS (
      |  SELECT g.domain, g.directive AS rule, g.value AS prefix,
      |    len(g.value) AS plen,
      |    '^' || replace(
      |      regexp_replace(
      |        CASE WHEN g.value LIKE '%$'
      |             THEN substr(g.value, 1, len(g.value) - 1)
      |             ELSE g.value END,
      |        '([.\[\]{}()+?^$|\\])', '\\\1', 'g'),
      |      '*', '.*')
      |      || CASE WHEN g.value LIKE '%$' THEN '$' ELSE '' END AS rx
      |  FROM grouped g JOIN agents a USING (domain, agent_line)
      |  WHERE g.directive IN ('allow', 'disallow') AND g.value != ''
      |    AND a.agent = '*'),
      |urls AS (
      |  SELECT p_partkey AS id, 'd' || (p_partkey % 20) || '.test' AS domain,
      |    '/p/' || p_partkey AS path
      |  FROM part WHERE p_partkey < 400),
      |matched AS (
      |  SELECT u.id, u.domain, r.rule, r.plen,
      |    ROW_NUMBER() OVER (PARTITION BY u.id
      |      ORDER BY r.plen DESC NULLS LAST,
      |        CASE WHEN r.rule = 'allow' THEN 1 ELSE 0 END DESC NULLS LAST) AS rn
      |  FROM urls u LEFT JOIN rules r
      |    ON r.domain = u.domain AND regexp_matches(u.path, r.rx))
      |SELECT domain, COUNT(*) AS n_urls,
      |  CAST(SUM(CASE WHEN rule IS NULL OR rule = 'allow' THEN 1 ELSE 0 END) AS BIGINT) AS n_allowed,
      |  CAST(SUM(CASE WHEN NOT (rule IS NULL OR rule = 'allow') THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked
      |FROM matched WHERE rn = 1
      |GROUP BY domain ORDER BY domain""".stripMargin

  /** Fetch slots assumed by the q150 politeness plan (a crawl
    * cluster's concurrent per-domain fetch lanes). */
  val FetchSlots = 32

  /** q150: politeness-aware fetch plan — the scheduling question every
    * polite crawl has to answer BEFORE it starts: given each domain's
    * robots `Crawl-delay` and URL inventory, how long does each
    * domain take (politeness serializes within a domain: n_urls x
    * delay, no worker count changes it), and what is the best
    * achievable makespan with [[FetchSlots]] lanes (the LPT lower
    * bound: max(longest domain, ceil(total work / slots)))? The
    * `bottleneck_share` column names the long-pole domains a planner
    * would shard by IP or deprioritize.
    *
    * Scale shape: robots parse is a tiny scan; URL counts are one
    * partial-agg groupBy over the frontier; the plan is a
    * |domains|-row join with two 1-row broadcast aggregates. */
  def fetchPlan(spark: SparkSession, sfDir: String): DataFrame = {
    val delays = parseRules(robotsTxt(spark), Seq("crawl-delay"))
      .filter(col("agent") === "*")
      .select(col("domain"), col("prefix").cast("long").as("crawl_delay_s"))
    val urls = graft.Tables.part(spark, sfDir)
      .select(concat(lit("d"), pmod(col("p_partkey"), lit(20)),
        lit(".test")).as("domain"))
      .groupBy(col("domain")).agg(count(lit(1)).as("n_urls"))
    val perDomain = urls.join(delays, Seq("domain"))
      .withColumn("serial_s", col("n_urls") * col("crawl_delay_s"))
    val bound = perDomain.agg(
      greatest(max(col("serial_s")),
        ceil(sum(col("serial_s")).cast("double") / FetchSlots).cast("long"))
        .as("makespan_lb_s"))
    perDomain.crossJoin(broadcast(bound))
      .select(col("domain"), col("n_urls"), col("crawl_delay_s"),
        col("serial_s"), col("makespan_lb_s"),
        round(col("serial_s").cast("double") / col("makespan_lb_s"), 6)
          .as("bottleneck_share"))
      .orderBy(col("domain"))
  }

  val fetchPlanSql: String =
    s"""WITH urls AS (
      |  SELECT 'd' || (p_partkey % 20) || '.test' AS domain,
      |    COUNT(*) AS n_urls
      |  FROM part GROUP BY 1),
      |delays AS (
      |  SELECT 'd' || k || '.test' AS domain,
      |    CAST((k % 5) + 1 AS BIGINT) AS crawl_delay_s
      |  FROM generate_series(0, 19) AS t(k)),
      |per_domain AS (
      |  SELECT u.domain, u.n_urls, d.crawl_delay_s,
      |    u.n_urls * d.crawl_delay_s AS serial_s
      |  FROM urls u JOIN delays d ON u.domain = d.domain),
      |bound AS (
      |  SELECT GREATEST(MAX(serial_s),
      |    CAST(CEIL(CAST(SUM(serial_s) AS DOUBLE) / $FetchSlots) AS BIGINT))
      |    AS makespan_lb_s
      |  FROM per_domain)
      |SELECT domain, n_urls, crawl_delay_s, serial_s, makespan_lb_s,
      |  ROUND(CAST(serial_s AS DOUBLE) / makespan_lb_s, 6) AS bottleneck_share
      |FROM per_domain CROSS JOIN bound
      |ORDER BY domain""".stripMargin
}
