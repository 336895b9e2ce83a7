package graft.core

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._

/** Typed facade over [[VectorTable]] reproducing the reference's
  * `VectorEngine<T>` trait semantics exactly (reference:
  * src/vector_engine.rs:10-54):
  *
  *  - `pull`/`pullx` are partial — out-of-bounds throws (reference panics);
  *  - `get`/`getx` are total — `Option`, with the bound
  *    `index + count <= len` (src/vector_engine.rs:41);
  *  - `getall` returns `None` (not an empty seq) on an empty store
  *    (src/vector_engine.rs:47-53);
  *  - records come back in insertion order with a dense implicit rowid.
  *
  * The `Encoder[T]` context bound plays the role of the reference's
  * `Serialize + Deserialize + Clone + Send + Sync` bound
  * (src/vector_engine.rs:11-18).
  */
final class VectorStore[T: Encoder](val table: VectorTable) {
  private def spark: SparkSession = table.spark
  private val enc = implicitly[Encoder[T]]

  /** Append one record — reference `push` (src/vector_engine.rs:25).
    * Single-row writes are a Spark anti-pattern; batch callers should use
    * [[BufferedVectorStore]] (the reference likewise routes `push` through
    * its WritableCache).
    */
  def push(obj: T): Unit = pushx(Seq(obj))

  /** Bulk append, input order preserved — reference `pushx`. */
  def pushx(objs: Seq[T]): Unit = {
    if (objs.nonEmpty) {
      val ds = spark.createDataset(objs)(enc)
      table.append(ds.toDF())
    }
  }

  def len: Long = table.length
  def isEmpty: Boolean = table.isEmpty

  /** Point read; throws on OOB — reference `pull` (src/vector_engine.rs:27). */
  def pull(index: Long): T =
    get(index).getOrElse(
      throw new IndexOutOfBoundsException(s"pull($index) on store of length $len"))

  /** Range read [index, index+count); throws on OOB — reference `pullx`. */
  def pullx(index: Long, count: Long): Seq[T] =
    getx(index, count).getOrElse(
      throw new IndexOutOfBoundsException(s"pullx($index,$count) on store of length $len"))

  /** Bounds-checked point read — reference `get` (src/vector_engine.rs:33-39). */
  def get(index: Long): Option[T] =
    if (index < 0 || index >= len) None
    else decode(table.point(index)).headOption

  /** Bounds-checked range read — reference `getx` (src/vector_engine.rs:40-46). */
  def getx(index: Long, count: Long): Option[Seq[T]] =
    if (index < 0 || count < 0 || index + count > len) None
    else Some(decode(table.range(index, count)))

  /** Batched point reads in ONE job — amortizes Spark's per-job latency
    * across a lookup batch; out-of-range ids are simply absent from the
    * result (total, like `get`).
    */
  def getMany(indices: Seq[Long]): Map[Long, T] = {
    if (indices.isEmpty) return Map.empty
    val df = table.points(indices)
    val payload = df.columns.filterNot(_ == VectorTable.ROWID).map(col)
    df.select(col(VectorTable.ROWID), struct(payload: _*).as("v"))
      .as[(Long, T)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong, enc))
      .collect().toMap
  }

  /** Full scan — reference `getall` (src/vector_engine.rs:47-53). */
  def getall(): Option[Seq[T]] =
    if (isEmpty) None else Some(decode(table.scan()))

  /** The store as a Dataset (insertion order not guaranteed without an
    * explicit sort — use `_rowid` when order matters).
    */
  def toDS(): Dataset[T] =
    table.scan().drop(VectorTable.ROWID).as[T](enc)

  private def decode(df: org.apache.spark.sql.DataFrame): Seq[T] =
    df.orderBy(col(VectorTable.ROWID))
      .drop(VectorTable.ROWID)
      .as[T](enc)
      .collect()
      .toSeq
}

object VectorStore {
  def create[T: Encoder](spark: SparkSession, root: String): VectorStore[T] =
    new VectorStore[T](VectorTable.create(spark, root))

  def open[T: Encoder](spark: SparkSession, root: String): VectorStore[T] =
    new VectorStore[T](VectorTable.open(spark, root))
}
