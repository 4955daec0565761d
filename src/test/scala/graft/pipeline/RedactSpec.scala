package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Redact pattern coverage: the PII shapes each regex must catch, the
  * shapes it must leave alone, and scrub's pass ordering. */
class RedactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scrubOne(s: String): String =
    Seq(s).toDF("t").select(Redact.scrub(col("t"))).collect()(0).getString(0)

  private def counts(s: String): (Long, Long, Long) = {
    val r = Seq(s).toDF("t").select(
      Redact.countMatches(col("t"), Redact.emailRe),
      Redact.countMatches(col("t"), Redact.phoneRe),
      Redact.countMatches(col("t"), Redact.ipv4Re)).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("e-mail shapes: plus tags, dotted locals, subdomains") {
    assert(scrubOne("mail a.b+tag@sub.example.co.uk now") === "mail <EMAIL> now")
    assert(counts("x@y.io and w_z%q@host.org")._1 === 2L)
    assert(counts("not-an-email @ host.com")._1 === 0L)
  }

  test("phone shapes: bare, area-coded, parenthesized") {
    assert(scrubOne("call 555-0199 ok") === "call <PHONE> ok")
    assert(scrubOne("call 415-555-0199 ok") === "call <PHONE> ok")
    assert(scrubOne("call (415) 555-0199 ok") === "call <PHONE> ok")
    assert(scrubOne("call 415 555 0199 ok") === "call <PHONE> ok")
    // plain 7-digit run without separators is NOT phone-shaped
    assert(counts("id 5550199 is fine")._2 === 0L)
  }

  test("ipv4 shapes, and digits inside them are not phones") {
    assert(scrubOne("from 10.0.255.1 today") === "from <IP> today")
    val (_, ph, ip) = counts("host 192.168.100.200 up")
    assert((ph, ip) === (0L, 1L))
  }

  test("scrub order: an e-mail's digits never become a half-eaten phone") {
    val s = "reach user555-0199@example.com or 555-0123"
    assert(scrubOne(s) === "reach <EMAIL> or <PHONE>")
  }

  test("clean text passes through untouched") {
    val s = "no pii here just words and the number 42"
    assert(scrubOne(s) === s)
    assert(counts(s) === ((0L, 0L, 0L)))
  }
}
