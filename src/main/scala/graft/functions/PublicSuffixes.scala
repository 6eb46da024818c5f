package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Public-suffix-list (PSL) registrable-domain extraction — the correct
  * grouping key for per-domain quotas, URL dedup, and crawl statistics.
  *
  * The naive "last two host labels" heuristic groups every ccTLD
  * registry one level too coarse: `a.co.uk` and `b.co.uk` both collapse
  * to `co.uk`, merging unrelated sites into one "domain" (and the same
  * for `com.au`, `github.io`, …). The fix is the publicsuffix.org
  * algorithm: find the LONGEST rule matching a suffix of the host; the
  * registrable domain is that public suffix plus one more label.
  *
  * Rules ship as a SNAPSHOT of the public suffix list (publicsuffix.org,
  * public data). Only rules that change the outcome vs the prevailing
  * default ("the last label is a public suffix") are carried: multi-label
  * suffixes, wildcard rules (`*.ck`: every direct child of `ck` is a
  * public suffix), and exception rules (`!www.ck`: overrides the
  * wildcard). Single-label TLDs (`com`, `org`, `uk`, …) need no entry —
  * the default rule already handles them. The list refreshes upstream a
  * few times a month; callers who need full fidelity pass a freshly
  * parsed rule file to [[suffixDim]]/[[joinRegistrable]] — the engine's
  * algorithm is rule-set-agnostic.
  *
  * Two surfaces, identical semantics (spec-pinned equal):
  *
  *  - [[registrableDomain]] — pure Column expression. Membership tests
  *    against literal arrays, longest-suffix `when` chain: shuffle-free,
  *    codegen'd, one scan at 100 TB. Right when the snapshot suffices.
  *  - [[suffixDim]] + [[joinRegistrable]] — the rules as a broadcast
  *    dimension, matched with per-depth broadcast left joins. Right when
  *    the caller ships a full, refreshed PSL (~10⁴ rules — too many to
  *    inline as plan literals, trivially broadcastable). Still
  *    shuffle-free on the fact side.
  */
object PublicSuffixes {

  /** Snapshot of outcome-changing PSL rules (publicsuffix.org, public
    * data; ICANN + a few high-traffic private-registry suffixes).
    * Syntax as upstream: `*.` wildcard, `!` exception. */
  val rules: Seq[String] = Seq(
    // United Kingdom
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
    "org.uk", "plc.uk", "sch.uk",
    // Australia
    "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au", "org.au",
    // New Zealand
    "ac.nz", "co.nz", "geek.nz", "gen.nz", "govt.nz", "iwi.nz", "kiwi.nz",
    "maori.nz", "net.nz", "org.nz", "school.nz",
    // Japan
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    // Brazil
    "com.br", "edu.br", "gov.br", "net.br", "org.br",
    // China
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "net.cn", "org.cn",
    // India
    "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in", "ind.in",
    "net.in", "nic.in", "org.in", "res.in",
    // South Africa
    "ac.za", "co.za", "gov.za", "net.za", "org.za", "web.za",
    // South Korea
    "ac.kr", "co.kr", "go.kr", "ne.kr", "or.kr", "re.kr",
    // Singapore / Taiwan / Hong Kong
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg",
    "com.tw", "edu.tw", "gov.tw", "idv.tw", "net.tw", "org.tw",
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    // Americas
    "com.ar", "edu.ar", "gob.ar", "net.ar", "org.ar",
    "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    "com.co", "edu.co", "gov.co", "net.co", "org.co",
    "com.pe", "edu.pe", "gob.pe", "net.pe", "org.pe",
    // Europe
    "com.pl", "edu.pl", "gov.pl", "net.pl", "org.pl", "waw.pl",
    "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
    "com.tr", "edu.tr", "gov.tr", "net.tr", "org.tr", "web.tr",
    "ac.il", "co.il", "gov.il", "muni.il", "net.il", "org.il",
    // Asia / Middle East / Africa
    "ac.th", "co.th", "go.th", "in.th", "net.th", "or.th",
    "com.my", "edu.my", "gov.my", "net.my", "org.my",
    "ac.id", "co.id", "go.id", "my.id", "or.id", "web.id",
    "com.ph", "edu.ph", "gov.ph", "net.ph", "org.ph",
    "com.vn", "edu.vn", "gov.vn", "net.vn", "org.vn",
    "com.pk", "edu.pk", "gov.pk", "net.pk", "org.pk",
    "com.bd", "edu.bd", "gov.bd", "net.bd", "org.bd",
    "com.eg", "edu.eg", "gov.eg", "net.eg", "org.eg",
    "com.sa", "edu.sa", "gov.sa", "med.sa", "net.sa", "org.sa",
    "com.ng", "edu.ng", "gov.ng", "net.ng", "org.ng",
    "ac.ke", "co.ke", "go.ke", "ne.ke", "or.ke",
    // three-label ICANN rules (sampled)
    "act.edu.au", "nsw.edu.au", "qld.edu.au", "vic.edu.au",
    "k12.ak.us", "k12.ca.us", "k12.ny.us", "cc.ca.us",
    // wildcard + exception (the canonical *.ck pair)
    "*.ck", "!www.ck",
    // wildcard with a two-label parent (Japanese city domains)
    "*.kawasaki.jp", "*.kitakyushu.jp", "!city.kawasaki.jp",
    "!city.kitakyushu.jp",
    // private-registry suffixes a crawl actually hits
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "netlify.app", "vercel.app", "web.app", "firebaseapp.com",
    "azurewebsites.net", "cloudfront.net", "pages.dev", "workers.dev",
    "wordpress.com", "tumblr.com", "neocities.org", "readthedocs.io")

  private def labelCount(s: String) = s.count(_ == '.') + 1

  // rule classes, keyed for the matcher: exceptions by their literal
  // suffix (match → public suffix is one label SHORTER); wildcards by
  // their parent (match on parent → public suffix is one label LONGER);
  // plain rules by themselves
  private[graft] val excByLen: Map[Int, Seq[String]] =
    rules.filter(_.startsWith("!")).map(_.drop(1))
      .groupBy(labelCount).withDefaultValue(Seq.empty)
  private[graft] val wildParentsByLen: Map[Int, Seq[String]] =
    rules.filter(_.startsWith("*.")).map(_.drop(2))
      .groupBy(labelCount).withDefaultValue(Seq.empty)
  private[graft] val plainByLen: Map[Int, Seq[String]] =
    rules.filterNot(r => r.startsWith("!") || r.startsWith("*"))
      .groupBy(labelCount).withDefaultValue(Seq.empty)

  /** Host part of a URL column (lowercased; the `[^/:?#]*` capture
    * stops at the port colon, so ports never reach the host); "" for
    * scheme-less input. */
  def hostOf(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)", 1))

  /** PSL registrable domain of a HOST column, as a pure expression.
    * Longest-rule match over the snapshot: exceptions beat wildcards
    * beat shorter rules beat the prevailing default (last label).
    * NULL when the host IS a public suffix (nothing registrable) or has
    * no dot at all. */
  def registrableDomainOfHost(host: Column): Column = {
    val h = lower(host)
    val labels = split(h, "\\.")
    val n = size(labels)
    // last-k-label suffix; "" (matches nothing) when the host is shorter
    def sufN(k: Int): Column =
      regexp_extract(h, s"(?:^|\\.)((?:[^.]+\\.){${k - 1}}[^.]+)$$", 1)
    def inSet(c: Column, s: Seq[String]): Column =
      if (s.isEmpty) lit(false) else c.isInCollection(s)
    // public-suffix label count: exceptions first (they exist only to
    // override a wildcard), then longest-match downward; default 1.
    // A wildcard only matches when the wildcard label EXISTS (host has
    // parent+1 labels) — the parent alone is not a listed suffix.
    val psLen =
      when(inSet(sufN(3), excByLen(3)), lit(2))
        .when(inSet(sufN(2), excByLen(2)), lit(1))
        .when(inSet(sufN(3), plainByLen(3)) ||
          (inSet(sufN(2), wildParentsByLen(2)) && n >= 3), lit(3))
        .when(inSet(sufN(2), plainByLen(2)) ||
          (inSet(sufN(1), wildParentsByLen(1)) && n >= 2), lit(2))
        .otherwise(lit(1))
    when(n > psLen && h =!= "",
      array_join(slice(labels, n - psLen, psLen + 1), "."))
  }

  /** PSL registrable domain straight from a URL column. */
  def registrableDomainOfUrl(url: Column): Column =
    registrableDomainOfHost(hostOf(url))

  /** The rule snapshot (or any caller-parsed PSL) as a dimension:
    * `(suffix, labels, kind)` with kind ∈ plain|wild|exc — wildcards
    * keyed by their PARENT suffix, exceptions by their literal suffix.
    * ~10⁴ rows for the full upstream list: broadcast-sized by
    * definition.
    *
    * Depth contract: the matchers evaluate plain/exception rules up to
    * 3 labels and wildcard parents up to 2 — which covers this
    * snapshot, but NOT every rule in the full upstream list (it has
    * 4+-label rules like `pvt.k12.ma.us` and deeper wildcard parents
    * like `*.compute.amazonaws.com`). A deeper rule silently falling
    * back to the default would regroup those hosts one level too
    * coarse — exactly the bug this module exists to fix — so
    * out-of-depth rules are REJECTED loudly here instead of being
    * carried and ignored; callers trim their rule file (or extend the
    * matcher depth) deliberately. */
  def suffixDim(spark: SparkSession,
                ruleLines: Seq[String] = rules): DataFrame = {
    import spark.implicits._
    val parsed = ruleLines
      .filter(l => l.nonEmpty && !l.startsWith("//"))
      .map { l =>
        if (l.startsWith("!")) (l.drop(1), labelCount(l.drop(1)), "exc")
        else if (l.startsWith("*.")) (l.drop(2), labelCount(l.drop(2)), "wild")
        else (l, labelCount(l), "plain")
      }
    val tooDeep = parsed.filter { case (_, n, kind) =>
      if (kind == "wild") n > 2 else n > 3
    }
    require(tooDeep.isEmpty,
      s"suffix rules beyond the supported match depth (plain/exc ≤ 3 labels, " +
        s"wildcard parents ≤ 2): ${tooDeep.take(5).map(_._1).mkString(", ")}" +
        (if (tooDeep.length > 5) s" … (${tooDeep.length} total)" else ""))
    parsed.toDF("suffix", "labels", "kind")
  }

  /** Broadcast-dimension form of [[registrableDomainOfHost]]: appends
    * `outCol` to `df` by longest-suffix match against `dim` (a
    * [[suffixDim]] frame — pass a freshly parsed upstream PSL for full
    * fidelity). One broadcast LEFT join per rule depth keyed on that
    * depth's host suffix, then the same precedence chain as the
    * expression form — the fact side is never shuffled, and each join's
    * build side is a filtered slice of an already-small dimension.
    * Semantics pinned equal to the expression form by spec. */
  def joinRegistrable(df: DataFrame, hostCol: String, outCol: String,
                      dim: DataFrame): DataFrame = {
    val h = lower(col(hostCol))
    val labels = split(h, "\\.")
    val n = size(labels)
    def sufN(k: Int): Column =
      regexp_extract(h, s"(?:^|\\.)((?:[^.]+\\.){${k - 1}}[^.]+)$$", 1)
    // one tiny build side per (depth, kind) combination that can fire
    def side(kind: String, len: Int, flag: String) =
      broadcast(dim.filter(col("kind") === kind && col("labels") === len)
        .select(col("suffix").as(s"__s_$flag"), lit(true).as(s"__$flag")))
    val joined = df
      .withColumn("__suf1", sufN(1)).withColumn("__suf2", sufN(2))
      .withColumn("__suf3", sufN(3))
      .join(side("exc", 3, "e3"), col("__suf3") === col("__s_e3"), "left")
      .join(side("exc", 2, "e2"), col("__suf2") === col("__s_e2"), "left")
      .join(side("plain", 3, "p3"), col("__suf3") === col("__s_p3"), "left")
      .join(side("wild", 2, "w2"), col("__suf2") === col("__s_w2"), "left")
      .join(side("plain", 2, "p2"), col("__suf2") === col("__s_p2"), "left")
      .join(side("wild", 1, "w1"), col("__suf1") === col("__s_w1"), "left")
    val psLen =
      when(col("__e3"), lit(2)).when(col("__e2"), lit(1))
        .when(col("__p3") || (col("__w2") && n >= 3), lit(3))
        .when(col("__p2") || (col("__w1") && n >= 2), lit(2))
        .otherwise(lit(1))
    // drop exactly the helper columns this function added — a prefix
    // wildcard would silently eat a caller's own "__"-named columns
    val helpers = Seq("__suf1", "__suf2", "__suf3") ++
      Seq("e3", "e2", "p3", "w2", "p2", "w1")
        .flatMap(f => Seq(s"__s_$f", s"__$f"))
    joined
      .withColumn(outCol,
        when(n > psLen && h =!= "",
          array_join(slice(labels, n - psLen, psLen + 1), ".")))
      .drop(helpers: _*)
  }
}
