package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-18 A/B harness for the derivation-builder fuse
  * ([[graft.operators.TextOps.corpusSubwordVocab]] /
  * [[graft.operators.TextOps.corpusBpeMerges]]): times the pre-round-18
  * per-window-length reference derivation against the fused single-pass
  * shape, alternating samples in one session (same warmup, same corpus,
  * same action), so the claim is controlled against host drift. Both
  * sides collect the full ranked table — the builders' real action.
  */
object ProfileGramBuilds {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = if (args.length > 1) args(1).toInt else 3
    val spark = graft.core.GraftSession.local("graft-profile-gram")
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").head()

    def words: DataFrame = graft.core.Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
    def bytes: DataFrame = graft.core.Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("ws"))
      .select(encode(col("ws"), "UTF-8").as("w"))

    def timed(name: String)(f: => Unit): Double = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // ----- subword vocab: reference (3 scans) vs fused (1 scan) --------
    def vocabRef(): Unit = {
      val grams = (2 to 4).map { n =>
        words.where(length(col("w")) >= n)
          .select(explode(expr(
            s"transform(sequence(1, length(w) - $n + 1), i -> substring(w, i, $n))")).as("g"))
      }.reduce(_ unionAll _)
      grams.groupBy("g").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("g"))
        .limit(graft.operators.TextOps.corpusVocabSize)
        .select("g").collect()
    }
    def vocabFused(): Unit = {
      words.select(explode(expr(
        """flatten(transform(sequence(2, 4), n ->
          |  CASE WHEN length(w) >= n
          |       THEN transform(sequence(1, length(w) - n + 1), i -> substring(w, i, n))
          |       ELSE CAST(array() AS ARRAY<STRING>) END))""".stripMargin)).as("g"))
        .groupBy("g").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("g"))
        .limit(graft.operators.TextOps.corpusVocabSize)
        .select("g").collect()
    }

    def vocabFusedUnrolled(): Unit = {
      words.select(explode(expr(
        """concat(
          |  CASE WHEN length(w) >= 2
          |       THEN transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))
          |       ELSE CAST(array() AS ARRAY<STRING>) END,
          |  CASE WHEN length(w) >= 3
          |       THEN transform(sequence(1, length(w) - 2), i -> substring(w, i, 3))
          |       ELSE CAST(array() AS ARRAY<STRING>) END,
          |  CASE WHEN length(w) >= 4
          |       THEN transform(sequence(1, length(w) - 3), i -> substring(w, i, 4))
          |       ELSE CAST(array() AS ARRAY<STRING>) END)""".stripMargin)).as("g"))
        .groupBy("g").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("g"))
        .limit(graft.operators.TextOps.corpusVocabSize)
        .select("g").collect()
    }

    // ----- BPE merges: reference (2 scans) vs fused (1 scan + ckpt) ----
    def mergesRef(): Unit = {
      val w = bytes
      def grams(n: Int) = w.where(length(col("w")) >= n)
        .select(explode(expr(
          s"transform(sequence(1, length(w) - $n + 1), i -> substring(w, i, $n))")).as("g"))
      val m1 = grams(2).groupBy("g").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("g")).limit(graft.operators.TextOps.bpeLevel1)
        .select("g").collect().map(_.getAs[Array[Byte]](0))
      grams(4).groupBy("g").agg(count(lit(1)).as("cnt"))
        .where(substring(col("g"), 1, 2).isInCollection(m1.toSeq) &&
          substring(col("g"), 3, 2).isInCollection(m1.toSeq))
        .orderBy(col("cnt").desc, col("g")).limit(graft.operators.TextOps.bpeLevel2)
        .select("g").collect()
    }
    def mergesFused(): Unit = {
      val counts = bytes.select(explode(expr(
        """concat(
          |  CASE WHEN length(w) >= 2
          |       THEN transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))
          |       ELSE CAST(array() AS ARRAY<BINARY>) END,
          |  CASE WHEN length(w) >= 4
          |       THEN transform(sequence(1, length(w) - 3), i -> substring(w, i, 4))
          |       ELSE CAST(array() AS ARRAY<BINARY>) END)""".stripMargin)).as("g"))
        .groupBy("g").agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val m1 = counts.where(length(col("g")) === 2)
        .orderBy(col("cnt").desc, col("g")).limit(graft.operators.TextOps.bpeLevel1)
        .select("g").collect().map(_.getAs[Array[Byte]](0))
      counts.where(length(col("g")) === 4)
        .where(substring(col("g"), 1, 2).isInCollection(m1.toSeq) &&
          substring(col("g"), 3, 2).isInCollection(m1.toSeq))
        .orderBy(col("cnt").desc, col("g")).limit(graft.operators.TextOps.bpeLevel2)
        .select("g").collect()
    }

    val rows = Seq(
      "vocab_ref" -> (() => vocabRef()),
      "vocab_fused" -> (() => vocabFused()),
      "vocab_fused2" -> (() => vocabFusedUnrolled()),
      "merges_ref" -> (() => mergesRef()),
      "merges_fused" -> (() => mergesFused()))
    val acc = scala.collection.mutable.LinkedHashMap[String, List[Double]]()
      .withDefaultValue(Nil)
    (1 to rounds).foreach { r =>
      rows.foreach { case (name, f) =>
        val t = timed(s"$name r$r")(f())
        acc(name) = acc(name) :+ t
      }
    }
    acc.foreach { case (name, ts) =>
      println(f"PROFILE_GRAM $name%s min=${ts.min}%.3f samples=" +
        ts.map(t => f"$t%.3f").mkString(","))
    }
  }
}
