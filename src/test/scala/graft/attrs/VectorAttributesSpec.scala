package graft.attrs

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Per-vector attribute store semantics (reference db/build.rs:252-286
  * `set_attribute_at`, db/stored.rs:625-638 `get_attribute`; tagged
  * String|Uint64 union, db.rs:21-27). */
class VectorAttributesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tempIndexDir(): String =
    java.nio.file.Files.createTempDirectory("graft_attrs_spec").toString

  test("set/get round-trip for both value types of the tagged union") {
    val path = tempIndexDir()
    VectorAttributes.setStringAttribute(path,
      Seq((1L, "cat"), (2L, "dog")).toDF("id", "v"), "id", "species", "v")
    VectorAttributes.setU64Attribute(path,
      Seq((1L, 100L), (2L, 200L)).toDF("id", "v"), "id", "weight", "v")

    val species = VectorAttributes.getAttribute(spark, path, "species")
      .orderBy("vector_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.isNullAt(2)))
    assert(species.toSeq === Seq((1L, "cat", true), (2L, "dog", true)))

    val weight = VectorAttributes.getAttribute(spark, path, "weight")
      .orderBy("vector_id").collect()
      .map(r => (r.getLong(0), r.isNullAt(1), r.getLong(2)))
    assert(weight.toSeq === Seq((1L, true, 100L), (2L, true, 200L)))
  }

  test("upsert: a later set batch overwrites (last-write-wins replay)") {
    val path = tempIndexDir()
    VectorAttributes.setU64Attribute(path,
      Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "v"), "id", "n", "v")
    VectorAttributes.setU64Attribute(path,
      Seq((2L, 99L)).toDF("id", "v"), "id", "n", "v")
    val r = VectorAttributes.getAttribute(spark, path, "n")
      .orderBy("vector_id").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(r === Seq((1L, 1L), (2L, 99L), (3L, 3L)))
  }

  test("attributes are independent per name") {
    val path = tempIndexDir()
    VectorAttributes.setStringAttribute(path,
      Seq((1L, "x")).toDF("id", "v"), "id", "a", "v")
    VectorAttributes.setStringAttribute(path,
      Seq((1L, "y")).toDF("id", "v"), "id", "b", "v")
    val a = VectorAttributes.getAttribute(spark, path, "a").collect()
    val b = VectorAttributes.getAttribute(spark, path, "b").collect()
    assert(a.length == 1 && a(0).getString(1) == "x")
    assert(b.length == 1 && b(0).getString(1) == "y")
  }

  test("getAttributeFor: resolves only the hit ids (per-hit fetch)") {
    val path = tempIndexDir()
    VectorAttributes.setStringAttribute(path,
      (1L to 100L).map(i => (i, s"label_$i")).toDF("id", "v"), "id", "label", "v")
    val hits = Seq(3L, 7L).toDF("vec_id")
    val r = VectorAttributes
      .getAttributeFor(spark, path, hits, "vec_id", "label")
      .orderBy("vector_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(r === Seq((3L, "label_3"), (7L, "label_7")))
  }

  test("empty store: get returns zero rows, not an error") {
    val path = tempIndexDir()
    assert(VectorAttributes.getAttribute(spark, path, "missing").count() === 0L)
  }
}
