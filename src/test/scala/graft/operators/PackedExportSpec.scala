package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The composed training export ([[TextOps.packedExportManifest]] +
  * [[TextOps.writePackedShards]]): shard count derived from token mass,
  * docs in seeded shuffle order, greedy [[TextOps.packBudget]]-token bins
  * within each shard — and the written shards must replay the manifest
  * exactly (membership, order, bin assignment), GlobalShuffleSpec-style.
  */
class PackedExportSpec extends SparkSpec {

  test("manifest invariants: budget, contiguous pos ranges, derived shard count") {
    val m = TextOps.packedExportManifest(spark, sf()).collect()
    assert(m.nonEmpty)
    val nShards = TextOps.shardCountFor(spark, sf())
    m.foreach { r =>
      val (shard, bin, nDocs, binTokens) =
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(r.getInt(6) == nShards, "n_shards column must carry the derived count")
      assert(shard >= 0 && shard < nShards)
      assert(binTokens <= TextOps.packBudget || nDocs == 1L,
        s"shard $shard bin $bin overfilled: $binTokens tokens across $nDocs docs")
    }
    // bins tile each shard's positions contiguously in bin order
    m.groupBy(_.getInt(0)).foreach { case (shard, bins) =>
      val ordered = bins.sortBy(_.getLong(1))
      assert(ordered.head.getInt(4) == 1, s"shard $shard does not start at pos 1")
      ordered.sliding(2).filter(_.length == 2).foreach { w =>
        val (a, b) = (w(0), w(1))
        assert(b.getInt(4) == a.getInt(5) + 1,
          s"shard $shard bins ${a.getLong(1)}→${b.getLong(1)} leave a pos gap")
      }
    }
  }

  test("BPE-basis exports (round 18): shard count = exact integer ceil of BPE mass") {
    val d = sf()
    val merges = TextOps.corpusBpeMerges(spark, d).toSeq
    // independent mass: the kernel applied doc by doc on the driver
    val kernel = new graft.functions.BpeMerges(merges.toArray)
    val sampledMass = TextOps.mixtureSampledDocs(spark, d).collect()
      .map(r => kernel.count(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1)))).sum
    val wantShards =
      math.max(1L, (sampledMass + TextOps.shardTokenBudget - 1) / TextOps.shardTokenBudget).toInt
    val m = TextOps.bpeMixtureExportManifest(spark, d).collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      assert(r.getInt(6) == wantShards,
        s"n_shards ${r.getInt(6)} != ceil(BPE mass $sampledMass / ${TextOps.shardTokenBudget})")
      assert(r.getLong(3) <= TextOps.packBudget || r.getLong(2) == 1L,
        "bin_bpe overfilled")
    }
    // the BPE bins really price the BPE basis: total bin mass = sampled mass
    assert(m.map(_.getLong(3)).sum == sampledMass, "bin masses must sum to BPE mass")
    // curriculum twin derives its count from the FULL corpus's BPE mass
    val fullMass = graft.core.Tables.documents(spark, d).select("text").collect()
      .map(r => kernel.count(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)))).sum
    val wantFull =
      math.max(1L, (fullMass + TextOps.shardTokenBudget - 1) / TextOps.shardTokenBudget).toInt
    val cm = TextOps.bpeCurriculumExportManifest(spark, d).collect()
    assert(cm.nonEmpty && cm.forall(_.getInt(8) == wantFull))
    assert(cm.map(_.getLong(3)).sum == fullMass)
  }

  test("cleaned export: manifest covers exactly the clean-corpus survivors") {
    val cleaned = Pipeline.cleanCorpus(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val m = Pipeline.cleanExportManifest(spark, sf()).collect()
    assert(m.nonEmpty && cleaned.nonEmpty)
    assert(m.map(_.getLong(2)).sum == cleaned.size.toLong,
      "manifest docs != clean-corpus survivors")
    assert(m.map(_.getLong(3)).sum == cleaned.values.sum,
      "manifest token mass != cleaned mass")
    val wantShards = math.max(1L,
      (cleaned.values.sum + TextOps.shardTokenBudget - 1) / TextOps.shardTokenBudget)
    assert(m.forall(_.getInt(6).toLong == wantShards),
      s"shard count must derive from the CLEANED token mass ($wantShards)")
    m.foreach(r => assert(r.getLong(3) <= TextOps.packBudget || r.getLong(2) == 1L,
      s"overfilled bin: $r"))
  }

  test("cleaned writer: shards hold exactly the survivors, bins match the manifest") {
    val out = tmpDir("clean-packed") + "/export"
    Pipeline.writeCleanPackedShards(spark, sf(), out)
    val onDisk = spark.read.parquet(out)
      .select("doc_id", "shard", "bin").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val survivors = Pipeline.cleanCorpus(spark, sf())
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(onDisk.map(_._1).toSet == survivors,
      "written docs != clean-corpus survivors")
    val manifest = Pipeline.cleanExportManifest(spark, sf()).collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val got = onDisk.groupBy(r => (r._2, r._3)).view.mapValues(_.length.toLong).toMap
    assert(got == manifest, "written (shard, bin) doc counts != manifest")
  }

  test("written shards replay the manifest: one file, shuffle order, matching bins") {
    val out = tmpDir("packed") + "/export"
    TextOps.writePackedShards(spark, sf(), out)
    val manifest = TextOps.packedExportManifest(spark, sf()).collect()
      .map(r => ((r.getInt(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap // (shard, bin) -> (n_docs, bin_tokens)
    val shuffle = TextOps.globalShuffle(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val tokensByDoc = graft.core.Tables.documents(spark, sf())
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

    val shards = shuffle.map(_._2).distinct
    var seen = Set.empty[(Int, Long)]
    shards.foreach { shard =>
      val dir = java.nio.file.Paths.get(out, s"shard=$shard")
      val listing = java.nio.file.Files.list(dir)
      val parquets = new scala.collection.mutable.ArrayBuffer[String]()
      try listing.iterator().forEachRemaining(p =>
        if (p.getFileName.toString.endsWith(".parquet")) parquets += p.toString)
      finally listing.close()
      assert(parquets.size == 1, s"shard $shard has ${parquets.size} files, want 1")
      val onDisk = spark.read.parquet(parquets.head)
        .select("doc_id", "bin").collect().map(r => (r.getLong(0), r.getLong(1)))
      // order = the shuffle manifest's pos order
      val want = shuffle.filter(_._2 == shard).sortBy(_._3).map(_._1).toSeq
      assert(onDisk.map(_._1).toSeq == want, s"shard $shard row order diverges")
      // bin assignment matches the manifest's (n_docs, bin_tokens) per bin
      onDisk.groupBy(_._2).foreach { case (bin, rows) =>
        val key = (shard, bin)
        val toks = rows.map(r => tokensByDoc(r._1).toLong).sum
        assert(manifest.get(key).contains((rows.length.toLong, toks)),
          s"bin $key on disk (${rows.length} docs, $toks tokens) != manifest ${manifest.get(key)}")
        seen += key
      }
    }
    assert(seen == manifest.keySet, "written bins != manifest bins")
  }

  test("BPE payload export (round 18): written id shards replay the checksum face") {
    val d = sf()
    val face = TextOps.bpePayloadExport(spark, d).collect()
      .map(r => ((r.getInt(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap // (shard, bin) -> (n_docs, bin_tokens, payload_checksum)
    assert(face.nonEmpty)
    face.foreach { case ((shard, bin), (nDocs, binToks, _)) =>
      assert(binToks <= TextOps.packBudget || nDocs == 1L,
        s"shard $shard bin $bin overfilled: $binToks BPE tokens across $nDocs docs")
    }
    // the face's total mass is the kernel's corpus mass (count ≡ encode length)
    val kernel = new graft.functions.BpeMerges(TextOps.corpusBpeMerges(spark, d))
    val corpusMass = graft.core.Tables.documents(spark, d).select("text").collect()
      .map(r => kernel.count(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)))).sum
    assert(face.values.map(_._2).sum == corpusMass,
      "bin token masses must sum to the kernel's corpus mass")

    val out = tmpDir("bpe-packed") + "/export"
    TextOps.writeBpeTokenShards(spark, d, out)
    // one file per shard, and the written id streams re-derive the face
    val shards = face.keySet.map(_._1)
    var replayed = Map.empty[(Int, Long), (Long, Long, Long)]
    shards.foreach { shard =>
      val dir = java.nio.file.Paths.get(out, s"shard=$shard")
      val listing = java.nio.file.Files.list(dir)
      val parquets = new scala.collection.mutable.ArrayBuffer[String]()
      try listing.iterator().forEachRemaining(p =>
        if (p.getFileName.toString.endsWith(".parquet")) parquets += p.toString)
      finally listing.close()
      assert(parquets.size == 1, s"shard $shard has ${parquets.size} files, want 1")
      spark.read.parquet(parquets.head)
        .select("bin", "doc_id", "token_ids").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2)))
        .groupBy(_._1).foreach { case (bin, rows) =>
          var pos = 0L
          var cks = 0L
          var toks = 0L
          rows.sortBy(_._2).foreach { case (_, _, ids) =>
            ids.foreach { id => pos += 1; toks += 1; cks += id.toLong * pos }
          }
          replayed += (shard, bin) -> (rows.length.toLong, toks, cks)
        }
    }
    assert(replayed == face,
      "(n_docs, bin_tokens, payload_checksum) re-derived from written shards != face")
  }

  test("export scrub (round 18): only affected shards rewritten; result = survivor export") {
    val d = sf()
    val base = tmpDir("bpe-scrub")
    val out = base + "/export"
    TextOps.writeBpeTokenShards(spark, d, out)
    val all = graft.core.Tables.documents(spark, d).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    // victims confined to exactly two shards
    val victims = (all.filter(_ % TextOps.packShards == 3).take(3) ++
      all.filter(_ % TextOps.packShards == 7).take(2)).toSeq
    assert(victims.size == 5)

    def snapshot(): Map[String, Long] = {
      val seen = scala.collection.mutable.Map.empty[String, Long]
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(out))
      try walk.iterator().forEachRemaining { p =>
        if (p.getFileName.toString.endsWith(".parquet"))
          seen += p.toString -> java.nio.file.Files.getLastModifiedTime(p).toMillis
      } finally walk.close()
      seen.toMap
    }
    def unaffected(m: Map[String, Long]) =
      m.filterNot(e => e._1.contains("shard=3/") || e._1.contains("shard=7/"))

    val before = snapshot()
    val affected = TextOps.scrubBpeTokenShards(spark, d, out, victims)
    assert(affected == Seq(3, 7), s"affected shards $affected, want Seq(3, 7)")
    assert(unaffected(snapshot()) == unaffected(before),
      "scrub must not touch (or even re-stat-change) unaffected shard files")

    // no victim survives on disk
    val onDisk = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(victims.forall(v => !onDisk.contains(v)), "victim ids still on disk")

    // the scrubbed export IS the from-scratch survivor export
    val fresh = base + "/fresh"
    TextOps.writeBpeTokenShardsOf(spark, d,
      graft.core.Tables.documents(spark, d)
        .where(!col("doc_id").isInCollection(victims))
        .select(col("doc_id"), col("text")), fresh)
    def manifest(dir: String) = TextOps.readBpeShardManifest(spark, dir).collect()
      .map(r => ((r.getInt(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(manifest(out) == manifest(fresh),
      "scrubbed export manifest != survivor-corpus export manifest")
  }

  test("export scrub: a shard losing ALL its docs reads back as an empty shard") {
    val d = sf()
    val out = tmpDir("bpe-scrub-all") + "/export"
    TextOps.writeBpeTokenShards(spark, d, out)
    val all = graft.core.Tables.documents(spark, d).select("doc_id")
      .collect().map(_.getLong(0))
    val victims = all.filter(_ % TextOps.packShards == 5).toSeq
    assert(victims.nonEmpty)
    assert(TextOps.scrubBpeTokenShards(spark, d, out, victims) == Seq(5))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(out, "shard=5")),
      "an all-victims shard must stay deleted (absent partition = empty shard)")
    val shards = spark.read.parquet(out).select("shard")
      .distinct().collect().map(_.getInt(0)).toSet
    assert(!shards.contains(5) && shards.nonEmpty, "readers must see the shard as empty")
  }
}
