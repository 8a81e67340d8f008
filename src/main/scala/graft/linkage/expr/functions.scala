package graft.linkage.expr

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graftbridge.{ColumnBridge, Register}

/** Column-level facade over the custom Catalyst expressions — the graft
  * analog of `org.apache.spark.sql.functions`. */
object functions {
  import ColumnBridge.{column => col_, expression => expr_}

  def normalize_ascii(c: Column): Column = col_(NormalizeAscii(expr_(c)))
  def opaque(c: Column): Column = col_(Opaque(expr_(c)))
  def jaro_winkler(a: Column, b: Column): Column =
    col_(JaroWinkler(expr_(a), expr_(b)))
  def hamming_sim(a: Column, b: Column): Column =
    col_(HammingSim(expr_(a), expr_(b)))
  def metaphone_sig(c: Column): Column = col_(MetaphoneExpr(expr_(c)))
  def dot_product(a: Column, b: Column): Column =
    col_(DotProduct(expr_(a), expr_(b)))
  def nearest_centroid(emb: Column, centroids: Array[Array[Double]]): Column =
    col_(NearestCentroid(expr_(emb), centroids))
  def nearest_centroids(emb: Column, centroids: Array[Array[Double]],
                        nProbe: Int): Column =
    col_(NearestCentroids(expr_(emb), centroids, nProbe))
  def sig_agreement(a: Column, b: Column): Column =
    col_(SigAgreement(expr_(a), expr_(b)))
  def pq_encode(emb: Column, codebooks: Array[Array[Array[Double]]]): Column =
    col_(PqEncodeExpr(expr_(emb), codebooks))
  def pq_lut(emb: Column, codebooks: Array[Array[Array[Double]]]): Column =
    col_(PqLutExpr(expr_(emb), codebooks))
  def pq_adc(lut: Column, code: Column, codebookSize: Int): Column =
    col_(PqAdcExpr(expr_(lut), expr_(code), codebookSize))
  def clk_encode(secretSeed: Int, fields: Column*): Column =
    col_(ClkEncode(fields.map(expr_), secretSeed))
  def clk_encode_blake(secretHex: String, fields: Column*): Column =
    col_(ClkEncodeBlake(fields.map(expr_), secretHex))
  def lambda_fold_keys(clk: Column, lambda: Int = 3, bfLen: Int = 64,
                       k: Int = 5, seed: Int = 0): Column =
    col_(LambdaFoldKeys(expr_(clk), lambda, bfLen, k, seed))

  /** Make all custom expressions SQL-callable in this session. */
  def registerAll(spark: SparkSession): Unit = {
    Register.tempFunction(spark, "normalize_ascii", es => NormalizeAscii(es.head))
    Register.tempFunction(spark, "jaro_winkler", es => JaroWinkler(es(0), es(1)))
    Register.tempFunction(spark, "hamming_sim", es => HammingSim(es(0), es(1)))
    Register.tempFunction(spark, "metaphone_sig", es => MetaphoneExpr(es.head))
    Register.tempFunction(spark, "dot_product", es => DotProduct(es(0), es(1)))
  }
}
