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
}
