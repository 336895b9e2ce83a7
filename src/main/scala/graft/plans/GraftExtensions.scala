package graft.plans

import graft.functions.{Blake2b256Expr, ByteFrameEnergy, CosineSimilarityF, DotProductF, LogM, MinHashSig, PqAdcDistance, ShingleHashes, SqReconCosine}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point — wire graft's native expressions into
  * any session via config, the deployment-grade injection path:
  *
  * {{{
  *   spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  *
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  *
  * Design note (SURVEY.md §4): the engine deliberately ships NO custom
  * optimizer rules or physical strategies. Every operator's plan was
  * inspected (`.explain("formatted")`) and Catalyst already produces the
  * shape we want — pushdown to the parquet scan, broadcast for dims, AQE
  * skew handling, TakeOrderedAndProject for top-k. The one tier where
  * built-ins measurably lose is per-element interpreted lambda evaluation,
  * and that is addressed at the Expression tier (codegen'd kernels), not
  * with planner surgery. A custom strategy would add maintenance surface
  * without changing a single shuffle count.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo("graft", null, name, usage, "")

    ext.injectFunction((
      FunctionIdentifier("dot_f"),
      info("dot_f", "dot_f(a, b) - double dot product of two ARRAY<FLOAT> columns"),
      (args: Seq[Expression]) => DotProductF(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("cosine_f"),
      info("cosine_f", "cosine_f(a, b) - cosine similarity of two ARRAY<FLOAT> columns"),
      (args: Seq[Expression]) => CosineSimilarityF(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(text, k) - k-element MinHash signature over word 3-grams"),
      (args: Seq[Expression]) => args match {
        case Seq(text, k) => MinHashSig(text, k.eval().asInstanceOf[Int])
        case Seq(text)    => MinHashSig(text, 6)
      }))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", "shingle_hashes(text) - sorted distinct 52-bit hashes of word 3-grams"),
      (args: Seq[Expression]) => ShingleHashes(args.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash16"),
      info("simhash16", "simhash16(text) - 16-bit SimHash from token-hash bit voting (map-only)"),
      (args: Seq[Expression]) => graft.functions.SimHash16(args.head)))
    ext.injectFunction((
      FunctionIdentifier("blake2b_256"),
      info("blake2b_256", "blake2b_256(expr) - lowercase-hex BLAKE2b-256 of a STRING or BINARY (RFC 7693)"),
      (args: Seq[Expression]) => Blake2b256Expr(args.head)))
    ext.injectFunction((
      FunctionIdentifier("sq_recon_cosine"),
      info("sq_recon_cosine", "sq_recon_cosine(x, q) - cosine of int8-quantize-reconstructed x vs q"),
      (args: Seq[Expression]) => SqReconCosine(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("ln_m"),
      info("ln_m", "ln_m(x) - natural log via Math.log (libm bit parity)"),
      (args: Seq[Expression]) => LogM(args(0))))
    ext.injectFunction((
      FunctionIdentifier("pq_adc"),
      info("pq_adc", "pq_adc(x, codebook, q, numSub) - product-quantization ADC distance"),
      (args: Seq[Expression]) => PqAdcDistance(args(0), args(1), args(2),
        args(3).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("byte_frame_energy"),
      info("byte_frame_energy", "byte_frame_energy(payload, frameSize) - per-frame unsigned-byte sums"),
      (args: Seq[Expression]) => ByteFrameEnergy(args(0), args(1).eval().asInstanceOf[Int])))
  }
}
