package graft.sources

import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class JsonlCorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = new StructType()
    .add("doc_id", LongType).add("text", StringType)

  private def withDir(test: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    try test(dir)
    finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("clean lines parse against the schema; malformed lines quarantine") {
    withDir { dir =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/shard0.jsonl"),
        """{"doc_id": 1, "text": "hello world"}
          |{"doc_id": 2, "text": "second doc"}
          |{broken json line
          |{"doc_id": 3, "text": "third"}
          |""".stripMargin)
      val (clean, quarantine) = JsonlCorpus.read(spark, dir, schema)
      assert(clean.count() === 3L)
      assert(clean.columns.toSeq === Seq("doc_id", "text"))
      assert(clean.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
      val q = quarantine.collect().map(_.getString(0))
      assert(q.length === 1)
      assert(q.head.contains("{broken json line"))
    }
  }

  test("round-trip: documents -> jsonl -> read == original content") {
    withDir { dir =>
      val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
        .select("doc_id", "text")
      docs.write.mode("overwrite").json(s"$dir/out")
      val (clean, quarantine) = JsonlCorpus.read(spark, s"$dir/out", schema)
      assert(quarantine.count() === 0L)
      val a = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val b = clean.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(a === b)
      // repack keeps content identical
      val pq = JsonlCorpus.toParquet(clean, s"$dir/pq")
      assert(pq.collect().map(r => r.getLong(0) -> r.getString(1)).toMap === a)
    }
  }
}
