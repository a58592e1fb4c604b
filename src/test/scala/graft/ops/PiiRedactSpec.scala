package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-fixture pins for every PII redaction class and the chain-order
  * hazards the scaladoc claims (SSN vs phone, IBAN vs long-number, IPv6 vs
  * IPv4 hex runs). The cross-engine oracle covers the synthetic-injection
  * mix; this spec pins the per-class semantics directly. */
class PiiRedactSpec extends SparkSpec {
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(TextOps.redactPii(col("t"))).head().getString(0)

  test("each class redacts to its typed tag") {
    assert(redact("mail a.b+c@x-y.example.org today") === "mail <EMAIL> today")
    assert(redact("call 555-0123 now") === "call <PHONE> now")
    assert(redact("card 1234567890123456 on file") === "card <NUM> on file")
    assert(redact("from 10.0.255.7 seen") === "from <IPV4> seen")
    assert(redact("at 2001:db8:85a3:0:0:8a2e:370:7334 seen") === "at <IPV6> seen")
    assert(redact("pay DE44500105175407324931 due") === "pay <IBAN> due")
    assert(redact("ssn 123-45-6789 filed") === "ssn <SSN> filed")
  }

  test("order: SSN wins over phone-shape; IBAN wins over long-number") {
    assert(redact("id 123-45-6789") === "id <SSN>")
    assert(redact("acct GB29NWBK60161331926819") === "acct <IBAN>")
    // a genuine phone next to an SSN: both tagged, neither half-claimed
    assert(redact("123-45-6789 or 555-0123") === "<SSN> or <PHONE>")
  }

  test("IPv4 at sentence end keeps its punctuation; non-IP dotted text untouched") {
    assert(redact("server 192.168.0.1.") === "server <IPV4>.")
    assert(redact("see section 1.2 and file.txt") === "see section 1.2 and file.txt")
  }

  test("no false positives on clean prose") {
    val clean = "the quick brown fox jumps over the lazy dog at dawn"
    assert(redact(clean) === clean)
  }

  test("multi-class document redacts every class in one pass") {
    assert(redact("u@example.com 2001:db8:85a3:0:0:8a2e:370:1 10.0.0.1 " +
      "DE445001051754073249 123-45-6789 555-0123 123456789")
      === "<EMAIL> <IPV6> <IPV4> <IBAN> <SSN> <PHONE> <NUM>")
  }
}
