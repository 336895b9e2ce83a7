package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The deterministic global shuffle ([[TextOps.globalShuffle]]): the
  * manifest is a permutation (dense 1..n positions per shard, every doc
  * exactly once), is a pure function of (seed, doc_id) — identical no
  * matter how the input arrives partitioned — and its physical plan sorts
  * per shard, never globally (the property that makes it a 100 TB write
  * plan rather than an ORDER BY).
  */
class GlobalShuffleSpec extends SparkSpec {

  test("positions are dense per shard and every doc appears exactly once") {
    val rows = TextOps.globalShuffle(spark, sf())
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val n = graft.core.Tables.documents(spark, sf()).count()
    assert(rows.length == n && rows.map(_._1).distinct.length == n)
    rows.groupBy(_._2).foreach { case (shard, ms) =>
      assert(ms.map(_._3).sorted.toSeq == (1 to ms.length),
        s"shard $shard positions are not dense 1..${ms.length}")
    }
  }

  test("the manifest is partitioning-independent (pure function of seed and doc_id)") {
    val base = TextOps.globalShuffle(spark, sf())
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // same computation over an adversarially re-partitioned, re-ordered input
    val docs = graft.core.Tables.documents(spark, sf())
      .repartition(17, col("source")).sortWithinPartitions(desc("doc_id"))
    val keyed = docs
      .select(col("doc_id"),
        md5(concat(lit(TextOps.shuffleSeed + ":"), col("doc_id").cast("string"))).as("skey"))
      .withColumn("shard",
        pmod(expr("CAST(conv(substr(skey, 1, 8), 16, 10) AS BIGINT)"),
          lit(TextOps.shardCountFor(spark, sf()).toLong)).cast("int"))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
          .orderBy(col("skey"), col("doc_id"))))
      .select("doc_id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(keyed == base, "shuffle manifest depends on input partitioning")
  }

  test("writeShards lands one file per shard, rows in manifest order") {
    val out = tmpDir("shards") + "/export"
    TextOps.writeShards(spark, sf(), out)
    val manifest = TextOps.globalShuffle(spark, sf())
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val byShard = manifest.groupBy(_._2)
    byShard.foreach { case (shard, rows) =>
      val dir = java.nio.file.Paths.get(out, s"shard=$shard")
      val files = java.nio.file.Files.list(dir).iterator()
      val parquets = new scala.collection.mutable.ArrayBuffer[String]()
      files.forEachRemaining(p =>
        if (p.getFileName.toString.endsWith(".parquet")) parquets += p.toString)
      assert(parquets.size == 1, s"shard $shard has ${parquets.size} files, want 1")
      // row order WITHIN the single file is the manifest's pos order
      val onDisk = spark.read.parquet(parquets.head)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      val want = rows.sortBy(_._3).map(_._1).toSeq
      assert(onDisk == want, s"shard $shard row order diverges from the manifest")
    }
    // every MANIFEST shard landed a dir (hash sharding may leave some of
    // the 0..n_shards-1 ids empty; empty shards write no dir)
    assert(byShard.keySet == manifest.map(_._2).toSet)
    assert(byShard.keySet.forall(sh =>
      sh >= 0 && sh < TextOps.shardCountFor(spark, sf())))
  }

  test("epoch re-shuffle: a new seed is a NEW permutation of the SAME corpus") {
    val e0 = TextOps.globalShuffleWith(spark, sf(), "graft-epoch-0")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val e1 = TextOps.globalShuffleWith(spark, sf(), "graft-epoch-1")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(e0.map(_._1).toSet == e1.map(_._1).toSet, "epochs must cover the same docs")
    assert(e0.toSet != e1.toSet, "a new epoch seed must produce a different permutation")
    // each epoch individually dense per shard
    e1.groupBy(_._2).foreach { case (shard, ms) =>
      assert(ms.map(_._3).sorted.toSeq == (1 to ms.length), s"epoch-1 shard $shard not dense")
    }
    // and reproducible: same seed, same manifest
    val e1b = TextOps.globalShuffleWith(spark, sf(), "graft-epoch-1")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(e1b.toSet == e1.toSet)
  }

  test("shard count is the exact integer ceil of token mass over the budget") {
    val t = graft.core.Tables.documents(spark, sf())
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).head().getLong(0)
    val want = math.max(1L, (t + TextOps.shardTokenBudget - 1) / TextOps.shardTokenBudget)
    assert(TextOps.shardCountFor(spark, sf()).toLong == want)
  }

  test("physical plan sorts within shard partitions — no global Sort") {
    val plan = TextOps.globalShuffle(spark, sf())
      .queryExecution.executedPlan.toString
    val globalSorts = "(?m)^\\s*\\*?\\(?\\d*\\)?\\s*Sort .*global=true".r
      .findAllIn(plan).length
    assert(globalSorts == 0, s"global sort in the shuffle plan:\n$plan")
  }
}
