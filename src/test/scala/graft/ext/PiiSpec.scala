package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.ext.{TextAnalysis => TA}

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) =
    Seq(text).toDF("t").select(
      TA.piiEmailCount(col("t")).as("e"),
      TA.piiPhoneCount(col("t")).as("p"),
      TA.piiIpv4Count(col("t")).as("i"),
      TA.redactPii(col("t")).as("r")).head()

  test("counts and redacts each PII type") {
    val r = one("mail a.b+c@ex-1.org and x@y.io, call +1 555-0142, host 10.0.3.77 up")
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) === ((2, 1, 1)))
    assert(r.getString(3) ===
      "mail [EMAIL] and [EMAIL], call [PHONE], host [IP] up")
  }

  test("email redacted first: dotted-quad local part never leaks an [IP]") {
    val r = one("from 1.2.3.4@corp.net now")
    // counts are independent raw-text scans: the quad does register as an
    // IPv4 match ('@' is a non-word char, so \b holds after the '4')...
    assert((r.getInt(0), r.getInt(2)) === ((1, 1)))
    // ...but redaction is ordered, so the email pass swallows the address
    // whole and the IP pass finds nothing left to mask.
    assert(r.getString(3) === "from [EMAIL] now")
  }

  test("PII-free text passes through untouched") {
    val s = "no addresses here, just 12 plain words and a dot."
    val r = one(s)
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) === ((0, 0, 0)))
    assert(r.getString(3) === s)
  }

  test("SSN and 16-digit card: counted and redacted with typed placeholders") {
    val r = Seq("ssn 123-45-6789 card 4111222233334444 done").toDF("t").select(
      TA.piiSsnCount(col("t")).as("s"),
      TA.piiCardCount(col("t")).as("c"),
      TA.redactPii(col("t")).as("r")).head()
    assert((r.getInt(0), r.getInt(1)) === ((1, 1)))
    assert(r.getString(2) === "ssn [SSN] card [CARD] done")
  }

  test("digit-dash shapes stay disjoint: phone is not an SSN and vice versa") {
    val r = Seq("call +1 555-0142 ssn 078-05-1120 x").toDF("t").select(
      TA.piiPhoneCount(col("t")).as("p"),
      TA.piiSsnCount(col("t")).as("s"),
      TA.redactPii(col("t")).as("r")).head()
    // the phone's 555-0142 tail has no second dash; the SSN has no '+d '
    // lead — each pattern matches exactly its own plant
    assert((r.getInt(0), r.getInt(1)) === ((1, 1)))
    assert(r.getString(2) === "call [PHONE] ssn [SSN] x")
  }

  test("card boundary guard: 17 digits and digit-adjacent runs do not match") {
    val r = Seq("a 41112222333344445 b x4111222233334444 c").toDF("t").select(
      TA.piiCardCount(col("t")).as("c"),
      TA.redactPii(col("t")).as("r")).head()
    // \b\d{16}\b: a 17-digit run has no interior word boundary, and a
    // letter-prefixed run has none before its first digit
    assert(r.getInt(0) === 0)
    assert(r.getString(1) === "a 41112222333344445 b x4111222233334444 c")
  }

  test("word-boundary guard: version-like 1.2.3.4.5 is not a clean IPv4 hit") {
    // \b\d{1,3}(\.\d{1,3}){3}\b scans leftmost-first: inside 1.2.3.4.5 the
    // first four octets match (the boundary after '4' is digit→'.'), so
    // redaction yields [IP].5 — pinned so a future "smarter" pattern that
    // changes this behavior fails loudly and gets a deliberate decision.
    val r = one("v 1.2.3.4.5 tag")
    assert(r.getString(3) === "v [IP].5 tag")
  }
}
