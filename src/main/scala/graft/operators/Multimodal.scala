package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic fake (`fakeDecode`) — but everything
  * Spark-side is real and scale-shaped: binary columns flow through
  * parquet, the decoder runs via `mapPartitions` with one decoder
  * instantiation per partition (the Scala analog of `mapInPandas` batch
  * processing: amortized setup, streaming iterators, no driver collect).
  */
object Multimodal {

  /** documents.text reinterpreted as an opaque binary payload — the column
    * layout an image/audio table would use: (id, blob, metadata...).
    */
  def asBinaryTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      col("source"),
      col("n_chars"))

  /** Metadata extraction without decoding: size + cryptographic digest —
    * pure column expressions, oracle-checkable.
    */
  def binaryMetadata(s: SparkSession, d: String): DataFrame =
    asBinaryTable(s, d).select(
      col("doc_id"),
      length(col("payload")).as("n_bytes"),
      sha2(col("payload"), 256).as("digest"),
      substring(hex(col("payload")), 1, 16).as("magic_hex"),
      col("source"))

  val binaryMetadataSql: String =
    """SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
      | sha256(text) AS digest,
      | UPPER(substr(hex(CAST(text AS BLOB)), 1, 16)) AS magic_hex,
      | source
      |FROM documents""".stripMargin

  /** Fixed-size chunking with stride sampling — the frame-sample/resize
    * shape for audio/video payloads: split each payload into 32-byte
    * frames, keep every 4th, fingerprint each kept frame. Pure column
    * expressions (explode over a sequence), so the 100 TB form is a
    * map-only stage with no shuffle; a real codec would replace the md5
    * with a decode-and-featurize per frame.
    */
  def payloadChunks(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("i", explode(expr(
        "CASE WHEN n_chars > 0 THEN sequence(0, CAST(ceil(n_chars / 32.0) AS INT) - 1) ELSE array() END")))
      .where(pmod(col("i"), lit(4)) === 0)
      .select(
        col("doc_id"),
        col("i").cast("long").as("chunk_idx"),
        expr("length(substring(text, i * 32 + 1, 32))").as("chunk_len"),
        expr("md5(substring(text, i * 32 + 1, 32))").as("chunk_digest"))

  val payloadChunksSql: String =
    """SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
      | length(substr(text, CAST(i * 32 + 1 AS INTEGER), 32)) AS chunk_len,
      | md5(substr(text, CAST(i * 32 + 1 AS INTEGER), 32)) AS chunk_digest
      |FROM (SELECT doc_id, text,
      |        unnest(range(0, CAST(ceil(n_chars / 32.0) AS BIGINT))) AS i
      |      FROM documents WHERE n_chars > 0)
      |WHERE i % 4 = 0""".stripMargin

  /** Per-frame energy profile over the raw payload bytes — the codec-free
    * audio/video framing analysis (silence detection, peak localization):
    * 64-byte frames, per-frame unsigned-byte sums via the fused
    * [[graft.functions.ByteFrameEnergy]] kernel, then peak frame by
    * argmax (ties → lowest index, `array_position` of the max in both
    * engines). All integer arithmetic, so the oracle — which must walk
    * the hex string two chars at a time — matches bit-for-bit. Map-only:
    * at 100 TB this is one codegen'd pass over the payload column.
    */
  val frameEnergySize = 64

  def frameEnergy(s: SparkSession, d: String): DataFrame =
    asBinaryTable(s, d)
      .where(col("n_chars") > 0)
      .withColumn("energies",
        graft.functions.VectorFunctions.byteFrameEnergyF(col("payload"), frameEnergySize))
      .select(
        col("doc_id"),
        size(col("energies")).cast("long").as("n_frames"),
        expr("aggregate(energies, CAST(0 AS BIGINT), (a, x) -> a + x)").as("total_energy"),
        (array_position(col("energies"), array_max(col("energies"))) - 1L).as("peak_idx"),
        array_max(col("energies")).as("peak_energy"))

  val frameEnergySql: String =
    s"""WITH b AS (
       |  SELECT doc_id, hex(CAST(text AS BLOB)) AS h,
       |         octet_length(CAST(text AS BLOB)) AS n
       |  FROM documents WHERE n_chars > 0),
       | f AS (
       |  SELECT doc_id,
       |   list_transform(range(0, CAST(ceil(n / $frameEnergySize.0) AS BIGINT)), fi ->
       |     list_reduce(list_prepend(CAST(0 AS BIGINT),
       |       list_transform(range(fi * $frameEnergySize, least((fi + 1) * $frameEnergySize, n)),
       |         j -> CAST(('0x' || substr(h, CAST(2 * j + 1 AS INTEGER), 2)) AS BIGINT))),
       |       (a, x) -> a + x)) AS energies
       |  FROM b)
       |SELECT doc_id, CAST(len(energies) AS BIGINT) AS n_frames,
       | list_reduce(list_prepend(CAST(0 AS BIGINT), energies), (a, x) -> a + x) AS total_energy,
       | CAST(list_position(energies, list_max(energies)) - 1 AS BIGINT) AS peak_idx,
       | list_max(energies) AS peak_energy
       |FROM f""".stripMargin

  /** Schema produced by the (stubbed) decoder. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false)
  ))

  /** STUB — deterministic fake decoder standing in for an image codec.
    * A real deployment replaces this body with (e.g.) JPEG decode +
    * feature extraction; the signature (bytes in, fixed-schema features
    * out) and the partition-wise batch driving around it are the real
    * design artifact.
    */
  def fakeDecode(payload: Array[Byte]): (Int, Int, Int, Double) = {
    val n = payload.length
    val width = n % 64 + 1
    val height = n % 37 + 1
    val channels = 3
    // integer sum then one divide → deterministic double
    val take = math.min(100, n)
    var sum = 0L
    var i = 0
    while (i < take) { sum += payload(i) & 0xff; i += 1 }
    val mean = if (take == 0) 0.0 else sum.toDouble / take.toDouble
    (width, height, channels, mean)
  }

  /** Partition-wise decode: the `mapInPandas`-shaped stage. One decoder
    * per partition, iterator in / iterator out (no materialization), rows
    * produced with an explicit schema.
    */
  def decodeFeatures(s: SparkSession, d: String): DataFrame = {
    val bin = asBinaryTable(s, d).select("doc_id", "payload")
    val rows = bin.rdd.mapPartitions { it =>
      // a real decoder would be constructed once per partition here
      it.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val (w, h, c, mean) = fakeDecode(payload)
        Row(id, w, h, c, mean)
      }
    }
    s.createDataFrame(rows, decodedSchema)
  }

  /** The decoder's arithmetic mirrored in SQL — lets the DuckDB oracle
    * verify the distributed plumbing end-to-end even though the "codec"
    * is a stub.
    */
  val decodeFeaturesSql: String =
    """SELECT doc_id,
      | CAST(octet_length(CAST(text AS BLOB)) % 64 + 1 AS INTEGER) AS width,
      | CAST(octet_length(CAST(text AS BLOB)) % 37 + 1 AS INTEGER) AS height,
      | 3 AS channels,
      | CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(range(1, least(100, length(text)) + 1), i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
      |      (acc, x) -> acc + x) AS DOUBLE)
      |   / CAST(least(100, length(text)) AS DOUBLE) AS mean_byte
      |FROM documents""".stripMargin

  /** Schema of the thumbnail/feature stage: an 8-bin byte histogram per
    * payload (the deterministic stand-in for "resize to fixed dims and
    * featurize").
    */
  val thumbnailSchema: StructType = StructType(
    StructField("doc_id", LongType, nullable = false) +:
      (0 until 8).map(b => StructField(s"h$b", IntegerType, nullable = false)))

  /** Fixed-size-batch feature extraction — the `mapInPandas` batch
    * contract made explicit: the partition iterator is processed in
    * batches of 64 rows (a real codec/model amortizes per-BATCH setup —
    * tensor allocation, accelerator dispatch — not just per-partition),
    * and each payload maps to a fixed-width feature row (here an 8-bin
    * byte histogram, i.e. a deterministic "thumbnail"). Streaming
    * iterators end to end: nothing materializes beyond one batch per
    * partition.
    */
  def thumbnailHistogram(s: SparkSession, d: String): DataFrame = {
    val bin = asBinaryTable(s, d).select("doc_id", "payload")
    val rows = bin.rdd.mapPartitions { it =>
      it.grouped(64).flatMap { batch =>
        // per-batch decoder setup would live here
        batch.map { r =>
          val p = r.getAs[Array[Byte]](1)
          val h = new Array[Int](8)
          p.foreach(b => h((b & 0xff) >> 5) += 1)
          Row.fromSeq(r.getLong(0) +: h.toIndexedSeq)
        }
      }
    }
    s.createDataFrame(rows, thumbnailSchema)
  }

  /** The histogram arithmetic mirrored in SQL for the oracle. */
  val thumbnailHistogramSql: String = {
    val bins = (0 until 8).map(b =>
      s"CAST(len(list_filter(range(1, length(text) + 1), i -> ascii(substr(text, i, 1)) // 32 = $b)) AS INTEGER) AS h$b")
      .mkString(",\n ")
    s"""SELECT doc_id,
       | $bins
       |FROM documents""".stripMargin
  }

  /** Exact binary dedup by content digest — the multimodal twin of text
    * exact-dedup: digests computed in the scan projection (the payload
    * itself never shuffles), one distinct aggregation, plus per-source
    * duplicate accounting so the result is non-empty even on a dupe-free
    * corpus (a 0-row oracle row proves nothing).
    */
  def binaryDedup(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    asBinaryTable(s, d)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_payloads"),
        countDistinct(sha2(col("payload"), 256)).as("n_distinct"),
        (count(lit(1)) - countDistinct(sha2(col("payload"), 256))).as("n_dupes"),
        min(col("doc_id")).as("first_doc"))
  }

  val binaryDedupSql: String =
    """SELECT source, COUNT(*) AS n_payloads,
      | COUNT(DISTINCT sha256(text)) AS n_distinct,
      | COUNT(*) - COUNT(DISTINCT sha256(text)) AS n_dupes,
      | MIN(doc_id) AS first_doc
      |FROM documents GROUP BY source""".stripMargin

  /** Cross-modality fusion: documents joined to their embedding rows
    * (doc_id = vec_id) — the text × vector join every RAG/curation pipeline
    * runs. Emits text quality proxies next to the embedding norm; the join
    * is key-to-key (co-partitionable at scale; broadcast at corpus ratios
    * where embeddings ≪ documents).
    */
  def docEmbeddingFusion(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"), size(split(col("text"), " ")).as("n_tokens"))
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id").as("doc_id"), col("label"),
        sqrt(graft.functions.VectorFunctions.dotF(col("embedding"), col("embedding")))
          .as("norm"))
    docs.join(emb, "doc_id")
      .select("doc_id", "n_chars", "n_tokens", "label", "norm")
  }

  val docEmbeddingFusionSql: String =
    s"""SELECT d.doc_id, d.n_chars,
       | CAST(len(string_split(d.text, ' ')) AS INTEGER) AS n_tokens,
       | e.label,
       | sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |   list_transform(range(1, 65), i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)),
       |   (acc, p) -> acc + p)) AS norm
       |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id""".stripMargin
}
