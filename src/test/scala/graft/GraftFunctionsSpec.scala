package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftFunctionsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    GraftFunctions.register(s)
    s
  }

  test("SQL surface: cosine / dot / sq_l2 over array<float> literals") {
    val r = spark.sql(
      """SELECT
        | graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |              array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
        | graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |           array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
        | graft_sq_l2(array(CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |             array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS l
        |""".stripMargin).head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 11.0)
    assert(r.getDouble(2) === 25.0)
  }

  test("SQL surface: token hashing and set intersection compose") {
    val r = spark.sql(
      """SELECT graft_inter_size(graft_token_hashes(split('a b c', ' ')),
        |                        graft_token_hashes(split('b c d', ' ')))
        |""".stripMargin).head().getLong(0)
    assert(r === 2L)
  }

  test("SQL surface: minhash/simhash agree with the Column API") {
    import graft.functions.FastFunctions
    import org.apache.spark.sql.functions._
    val viaSql = spark.sql(
      "SELECT graft_simhash(graft_token_hashes(split('x y z', ' ')))")
      .head().getLong(0)
    val viaCol = spark.range(1)
      .select(FastFunctions.simhash64(
        FastFunctions.hashedTokenSet(lit("x y z"))))
      .head().getLong(0)
    assert(viaSql === viaCol)
  }

  test("SQL surface: shingle hashes compose with intersection") {
    // "a b c" and "b c d" share the bigram "b c" only
    val r = spark.sql(
      """SELECT graft_inter_size(
        |  graft_shingle_hashes(split('a b c', ' '), 2),
        |  graft_shingle_hashes(split('b c d', ' '), 2))""".stripMargin)
      .head().getLong(0)
    assert(r === 1L)
  }

  test("SQL surface: pq_dist decodes codes against the codebook") {
    // dim=2, D=1, C=2, m=2; code 1 selects codebook row [1, 2]:
    // dist = ((3-0)-1)² + ((4-0)-2)² = 4 + 4 = 8
    val r = spark.sql(
      """SELECT graft_pq_dist(
        |  array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
        |  array(0.0D, 0.0D), array(1), array(9.0D, 9.0D, 1.0D, 2.0D))
        |""".stripMargin).head().getDouble(0)
    assert(r === 8.0)
  }

  test("SQL surface: graft_rotate applies a row-major rotation in f32") {
    // 90° rotation [[0,-1],[1,0]] of (1, 2) = (-2, 1)
    val v = spark.sql(
      """SELECT graft_rotate(
        |  array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |  array(0.0D, -1.0D, 1.0D, 0.0D))""".stripMargin)
      .head().getSeq[Float](0)
    assert(v === Seq(-2.0f, 1.0f))
  }

  test("SQL surface: graft_sign_bits packs and graft_hamming counts") {
    val r = spark.sql(
      """SELECT graft_hamming(
        |  graft_sign_bits(array(CAST(1.0 AS FLOAT), CAST(-1.0 AS FLOAT)),
        |    array(0.0D, 0.0D)),
        |  graft_sign_bits(array(CAST(-1.0 AS FLOAT), CAST(-1.0 AS FLOAT)),
        |    array(0.0D, 0.0D)))""".stripMargin).head().getInt(0)
    assert(r === 1)
  }

  test("SQL surface: pq_reconstruct inverts encode up to the codebook grid") {
    // dim=2, D=1, C=2, m=2; code 1 selects codebook row [1, 2]:
    // reconstruction = centroid [10, 20] + [1, 2] = [11, 22]
    val v = spark.sql(
      """SELECT graft_pq_reconstruct(
        |  array(10.0D, 20.0D), array(1), array(9.0D, 9.0D, 1.0D, 2.0D), 2)
        |""".stripMargin).head().getSeq[Float](0)
    assert(v === Seq(11.0f, 22.0f))
  }

  test("SQL surface: index-build and sq8 kernels are registered") {
    val part = spark.sql(
      """SELECT graft_nearest_centroid(
        |  array(CAST(9.0 AS FLOAT), CAST(9.0 AS FLOAT)),
        |  array(0.0D, 0.0D, 10.0D, 10.0D))""".stripMargin).head().getInt(0)
    assert(part === 1)
    val codes = spark.sql(
      """SELECT graft_pq_encode(
        |  array(CAST(9.0 AS FLOAT), CAST(-4.0 AS FLOAT)),
        |  array(0.0D, 10.0D, 5.0D, -5.0D), 2, 2)""".stripMargin)
      .head().getSeq[Int](0)
    assert(codes === Seq(1, 1))
    val rt = spark.sql(
      """SELECT graft_sq8_decode(
        |  graft_sq8_encode(array(CAST(1.25 AS FLOAT)),
        |    array(0.0D), array(0.01D)),
        |  array(0.0D), array(0.01D))""".stripMargin).head().getSeq[Double](0)
    assert(math.abs(rt.head - 1.25) <= 0.005 + 1e-9)
    val rep = spark.sql(
      "SELECT graft_shingle_repetition(array('a','b','a','b'), 2)")
      .head().getLong(0)
    assert((rep >>> 32, rep & 0xFFFFFFFFL) === ((2L, 3L)))
  }

  test("SQL surface: positional shingle hashes and aHash bits") {
    // "a b a b": bigram at position 0 equals the one at position 2
    val pos = spark.sql(
      "SELECT graft_shingle_hashes_pos(array('a','b','a','b'), 2)")
      .head().getSeq[Long](0)
    assert(pos.length === 3)
    assert(pos(0) === pos(2))
    assert(pos(0) !== pos(1))
    val bits = spark.sql(
      """SELECT graft_ahash_bits(array(CAST(0.0 AS FLOAT),
        |  CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT)))"""
        .stripMargin).head().getLong(0)
    assert(bits === ((1L << 1) | (1L << 3)))
  }

  test("SQL surface: arity errors are rejected at analysis") {
    intercept[Exception] {
      spark.sql("SELECT graft_cosine(array(CAST(1.0 AS FLOAT)))").collect()
    }
  }

  test("SQL surface: declared input types coerce array<double> correctly") {
    // before inputTypes were declared this reinterpreted double bytes as
    // floats and returned garbage; now analysis inserts a proper cast
    val r = spark.sql("SELECT graft_sq_l2(array(0.0D, 0.0D), array(3.0D, 4.0D))")
      .head().getDouble(0)
    assert(r === 25.0)
  }

  test("SQL surface: null token elements are skipped, not NPE") {
    val r = spark.sql(
      """SELECT graft_inter_size(graft_token_hashes(array('a', NULL, 'b')),
        |                        graft_token_hashes(array('a', 'b')))
        |""".stripMargin).head().getLong(0)
    assert(r === 2L)
  }

  test("SQL surface: dimension mismatch fails loudly, not silently") {
    val e = intercept[Exception] {
      spark.sql("""SELECT graft_dot(array(CAST(1.0 AS FLOAT)),
                  | array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)))""".stripMargin)
        .collect()
    }
    assert(e.getMessage.contains("dimension mismatch") ||
      (e.getCause != null && e.getCause.getMessage.contains("dimension mismatch")))
  }
}
