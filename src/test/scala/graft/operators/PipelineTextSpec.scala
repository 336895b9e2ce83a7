package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mechanics of the training-pipeline text filters on crafted inputs (the
  * declared queries oracle-check the same expressions over the corpus,
  * where the synthetic text exercises fewer edge shapes).
  */
class PipelineTextSpec extends SparkSpec {

  test("pii masking replaces every email and phone occurrence, counts match") {
    import spark.implicits._
    val df = Seq(
      (1L, "write to alice.b@example.org or bob@site.io now"),
      (2L, "call 555-1234 or 555-9876 twice 555-1234"),
      (3L, "clean text with no contact info at all"))
      .toDF("doc_id", "text")
    val email = "[a-z0-9._]+@[a-z0-9.]+"
    val phone = "[0-9]{3}-[0-9]{4}"
    val byId = df.select(
      col("doc_id"),
      expr(s"size(regexp_extract_all(text, '$email', 0))").as("n_emails"),
      expr(s"size(regexp_extract_all(text, '$phone', 0))").as("n_phones"),
      expr(s"regexp_replace(regexp_replace(text, '$email', '<EMAIL>'), '$phone', '<PHONE>')").as("masked")
    ).collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(byId(1L) == ((2, 0, "write to <EMAIL> or <EMAIL> now")))
    assert(byId(2L) == ((0, 3, "call <PHONE> or <PHONE> twice <PHONE>")))
    assert(byId(3L) == ((0, 0, "clean text with no contact info at all")))
  }

  test("contamination flags exactly the docs sharing an 8-gram with the eval set") {
    import spark.implicits._
    val shared = "one two three four five six seven eight"
    val docs = Seq(
      (0L, s"$shared tail words here"),            // eval doc (id % 50 == 0)
      (7L, s"prefix $shared and more"),            // contaminated via shared 8-gram
      (9L, "totally different words that overlap nothing at all okay"))
      .toDF("doc_id", "text")
    // same expression pipeline as the declared query, against local docs
    val grams = docs.withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        """filter(transform(toks, (t, i) ->
          |  IF(i + 8 <= size(toks), concat_ws(' ', slice(toks, i + 1, 8)), NULL)),
          |  x -> x IS NOT NULL)""".stripMargin)).as("g"))
    val evalGrams = grams.where(col("doc_id") % 50 === 0).select(col("g").as("eg")).distinct()
    val hit = grams.join(evalGrams, col("g") === col("eg"), "left")
      .groupBy("doc_id").agg(count(lit(1)).as("n"), count(col("eg")).as("h"))
      .where(col("h") > 0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(hit.keySet == Set(0L, 7L), s"flagged: ${hit.keySet}")
    assert(hit(0L)._1 == hit(0L)._2, "eval doc should be 100% contaminated")
    assert(hit(7L)._2 == 1L, "exactly the one shared 8-gram should hit")
  }

  test("bigram LM score: hand-computed add-one smoothing on a crafted corpus, bit-exact") {
    import spark.implicits._
    // corpus: "a b a b" + "a b c" → c(a)=3, c(b)=3, c(c)=1, V=3
    // bigrams: (a b)=3, (b a)=1, (b c)=1
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = TextOps.lmScoreOf(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val pAB = math.log(4.0 / 6.0) // (3+1)/(c(a)+V)
    val pBA = math.log(2.0 / 6.0)
    val pBC = math.log(2.0 / 6.0)
    // position-ordered fold, then one division — same op order as the query
    val d1 = (0.0 + pAB + pBA + pAB) / 3.0
    val d2 = (0.0 + pAB + pBC) / 2.0
    assert(got(1L)._1 == 3L && got(2L)._1 == 2L)
    assert(java.lang.Double.doubleToLongBits(got(1L)._2) == java.lang.Double.doubleToLongBits(d1))
    assert(java.lang.Double.doubleToLongBits(got(2L)._2) == java.lang.Double.doubleToLongBits(d2))
    // single-token docs contribute no bigrams and drop out on both engines
    val single = TextOps.lmScoreOf(Seq((9L, "lonely")).toDF("doc_id", "text"))
    assert(single.count() == 0L)
    // plan: no cartesian anywhere; the vocab scalar is the only broadcast
    val plan = TextOps.lmScoreOf(docs).queryExecution.sparkPlan.treeString
    assert(!plan.contains("CartesianProduct"), s"unexpected cartesian:\n$plan")
  }

  test("source KL divergence: zero for distribution-identical sources, positive for skew, never negative") {
    import spark.implicits._
    def kl(rows: (String, String)*): Map[String, Double] =
      TextOps.sourceKlOf(rows.toSeq.toDF("source", "text"))
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // two sources with IDENTICAL token distributions: every term ln(1)=0 → KL exactly 0.0
    val same = kl(("s1", "a a b"), ("s2", "a b a"))
    assert(same("s1") == 0.0 && same("s2") == 0.0)
    // skewed source diverges positively; Gibbs: KL >= 0 always
    val skew = kl(("s1", "a a a a b"), ("s2", "b b b b a"))
    assert(skew.values.forall(_ > 0.0), s"expected positive divergence: $skew")
    // symmetric construction → symmetric divergences, bit-exact
    assert(java.lang.Double.doubleToLongBits(skew("s1")) ==
      java.lang.Double.doubleToLongBits(skew("s2")))
  }

  test("quality budget cutoff is maximal: kept mass fits, the next bucket would not") {
    import org.apache.spark.sql.functions._
    val r = TextOps.qualityBudgetCutoff(spark, sf()).head()
    val (budget, cutoff, keptDocs, keptTokens) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(keptTokens <= budget && keptDocs > 0)
    // recompute from scores: kept = every doc at a bucket >= cutoff,
    // and including the single next-best bucket below must overflow
    val q = TextOps.qualityScores(spark, sf())
      .select(col("n_tokens").cast("long").as("nt"),
        floor(col("quality_score") * 1000).cast("long").as("qb"))
      .collect().map(row => (row.getLong(0), row.getLong(1)))
    assert(q.filter(_._2 >= cutoff).map(_._1).sum == keptTokens)
    assert(q.count(_._2 >= cutoff) == keptDocs)
    val below = q.map(_._2).filter(_ < cutoff)
    if (below.nonEmpty) {
      val next = below.max
      val withNext = q.filter(_._2 >= next).map(_._1).sum
      assert(withNext > budget,
        s"cutoff not maximal: adding bucket $next ($withNext tokens) still fits $budget")
    }
  }

  test("leakage-safe split: no near-dup cluster straddles two splits; counts partition the corpus") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, sf()).select("doc_id")
    val clusters = Dedup.duplicateClusters(spark, sf())
    val canon = docs.join(clusters.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("canon"))
      .withColumn("h", expr(
        "pmod(CAST(conv(substr(md5(concat(CAST(canon AS STRING), 'split')), 1, 13), 16, 10) AS BIGINT), 100)"))
      .withColumn("split",
        when(col("h") < 90, "train").when(col("h") < 95, "val").otherwise("test"))
    // the structural guarantee, checked empirically: one split per cluster
    val straddlers = canon.groupBy("canon")
      .agg(countDistinct(col("split")).as("n_splits"))
      .where(col("n_splits") > 1).count()
    assert(straddlers == 0L, s"$straddlers clusters straddle splits")
    // the declared query's counts partition the corpus exactly
    val declared = Pipeline.leakageSafeSplits(spark, sf())
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(declared.values.map(_._1).sum == docs.count())
    val multiDocClusters = clusters.groupBy("cluster_id").count().where(col("count") > 1).count()
    assert(declared.values.map(_._2).sum <= docs.count())
    assert(multiDocClusters == 0L || declared.values.exists { case (n, c) => n > c },
      "expected at least one split to hold a multi-doc cluster when clusters exist")
  }
}
